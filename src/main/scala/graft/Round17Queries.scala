package graft

import org.apache.spark.sql.functions._

/** Round-17 batch (q304+): the round-16 verdict's named additions —
  * the Adamic–Adar candidate gate for the decade where wedge volume is
  * the suite's cost concentration, the audio near-dup that completes
  * the multimodal modality set (image q151, video q163/q303), and
  * DuckDB-replayable oracle rows for the pure-array geo functions
  * (force2D / Multi promotion / asGeoJSON) that were spec-only.
  *
  * House discipline unchanged: integer-exact scores, md5-derived keys
  * both engines replay, planted witnesses beyond the corpus id range,
  * ORDER BY on every output.
  */
object Round17Queries {
  import Tables._

  /** Gated Adamic–Adar ([[ops.Graph.adamicAdar]] with
    * `minCommonNeighbors = 2`) over q271's order–part graph: identical
    * semantics to q271 EXCEPT that pairs sharing only ONE neighbor are
    * dropped — and, engine-side, never shuffled: endpoints whose
    * full-graph degree is below the floor are pruned from the neighbor
    * lists BEFORE in-task pair generation (common_neighbors(u, v) <=
    * min(deg(u), deg(v)), so the prune is lossless w.r.t. the gate),
    * which cuts the singleton majority of wedge traffic ahead of the
    * (u, v) exchange. The oracle replays only the declared semantics —
    * `HAVING COUNT(*) >= 2` on the wedge aggregate — proving the prune
    * changes nothing observable.
    */
  private lazy val q304: QueryDef =
    QueryDef("q304_adamic_adar_gated",
      Some("""
        WITH und AS (SELECT DISTINCT l_orderkey AS a,
                       l_partkey + 1000000000000 AS b FROM lineitem),
        sym AS (SELECT a AS w, b AS n FROM und
                UNION ALL SELECT b AS w, a AS n FROM und),
        deg AS (SELECT w, COUNT(*) AS deg FROM sym GROUP BY w),
        mids AS (SELECT sym.w, sym.n,
                   CAST(floor(1000000.0 / ln(deg.deg)) AS BIGINT) AS c
                 FROM sym JOIN deg ON sym.w = deg.w
                 WHERE deg.deg BETWEEN 2 AND 64),
        wedges AS (SELECT w1.n AS u, w2.n AS v, w1.c
                   FROM mids w1 JOIN mids w2 ON w1.w = w2.w
                   WHERE w1.n < w2.n),
        scored AS (SELECT u, v, CAST(SUM(c) AS BIGINT) AS aa_micro,
                          CAST(COUNT(*) AS BIGINT) AS common_neighbors
                   FROM wedges GROUP BY u, v
                   HAVING COUNT(*) >= 2),
        nonadj AS (SELECT scored.* FROM scored
                   LEFT JOIN und ON und.a = scored.u AND und.b = scored.v
                   WHERE und.a IS NULL)
        SELECT u, v, aa_micro, common_neighbors
        FROM nonadj ORDER BY aa_micro DESC, u, v LIMIT 100"""),
      (s, d) => {
        val edges = lineitem(s, d).select(col("l_orderkey").as("u"),
          (col("l_partkey") + lit(1000000000000L)).as("v"))
        // aggPartitions is the WEDGE-DECADE knob (per-task agg maps at
        // a few million entries once the one-pass map spills — the
        // sf10 matrix in PLANS.md). A hard-coded 256 is a constant
        // tuned for that decade: at sf0.1/sf1 it forces a non-AQE
        // 256-partition exchange for no benefit (measured NEUTRAL at
        // sf1, round-18 A/B at sf0.1 below). Default 0 = session
        // shuffle partitions + AQE coalescing (scale-adaptive);
        // production/sf10 runs export SPARK_GRAFT_AA_AGG_PARTS=256.
        val aggParts = sys.env.get("SPARK_GRAFT_AA_AGG_PARTS")
          .flatMap(_.toIntOption).getOrElse(0)
        graft.ops.Graph.adamicAdar(edges, maxDegree = 64, topK = 100,
            minCommonNeighbors = 2, aggPartitions = aggParts)
          .orderBy(col("aa_micro").desc, col("u"), col("v"))
      })

  // q305 planted "audio clips" (97-byte payloads; the stub decoder
  // reads frame i's energy as byte (i*37) mod 97, 128 frames): B = A
  // with ONE byte edited (a re-encode-shaped localized change — each
  // contour window crossing the two affected frames moves <= 2 bits),
  // D = A rotated left by 5 bytes, which under the stub's (i*37) mod
  // 97 walk is EXACTLY an 8-frame shift of A's energy sequence
  // (37*8 = 296 = 5 mod 97) — the trim/remux plant: D's windows equal
  // A's at positions offset by one stride, invisible to any
  // same-position vote, caught position-free. Verified by simulation:
  // (A,B) pairs at 8 a-side windows, (A,D) at 7, (B,D) at 7.
  private val AudPlantA =
    "silver drums echo across the midnight harbor while nine quiet sailors hum a slow farewell tunexx" + "x"
  private val AudPlantB = AudPlantA.updated(40, 'Q')
  private val AudPlantD = AudPlantA.substring(5) + AudPlantA.substring(0, 5)
  require(AudPlantA.length == 97 && AudPlantA(40) != 'Q',
    "q305 plant must be 97 bytes with a real byte-40 edit")

  /** Banded audio near-dup ([[Multimodal.audioFrameEnergies]] ->
    * [[Multimodal.audioContourSignatures]] ->
    * [[Multimodal.frameBandNearDup]]) — the modality that completes
    * the near-dup set (image q151 pHash, video q163 exact vote + q303
    * banded): 65-frame energy-CONTOUR windows (bit = energy rises,
    * gain-invariant) at stride 8 band into 4 sixteen-bit chunks, meet
    * position-free under the df cap, verify by exact popcount, and
    * clips pair on >= 2 distinct close a-side windows. The oracle
    * replays the stub byte walk, the contour fold, the banding, the
    * cap, and the vote over the documents corpus plus the three
    * plants.
    */
  private lazy val q305: QueryDef =
    QueryDef("q305_audio_band_neardup",
      Some(s"""
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT * FROM (VALUES
            (CAST(950001 AS BIGINT), '$AudPlantA'),
            (CAST(950002 AS BIGINT), '$AudPlantB'),
            (CAST(950003 AS BIGINT), '$AudPlantD')) v(doc_id, text)),
        m AS (SELECT doc_id, text,
                     octet_length(CAST(text AS BLOB)) AS len FROM corpus),
        e AS (SELECT doc_id,
                [CASE WHEN len = 0 THEN 0
                      ELSE ascii(substr(text, ((k*37) % len) + 1, 1)) END
                 for k in range(0, 128)] AS es
              FROM m),
        w AS (SELECT doc_id, es, unnest(range(0, 64, 8)) AS s FROM e),
        sig AS (SELECT doc_id, CAST(s AS INTEGER) AS i,
                  CAST(list_sum([CASE WHEN es[s + k + 2] > es[s + k + 1]
                        THEN (CAST(1 AS BIGINT) << k) ELSE 0 END
                        for k in range(0, 32)]) AS BIGINT) AS lo,
                  CAST(list_sum([CASE WHEN es[s + k + 2] > es[s + k + 1]
                        THEN (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END
                        for k in range(32, 64)]) AS BIGINT) AS hi
                FROM w),
        ch AS (SELECT doc_id, i, lo, hi, c,
                 CASE WHEN c < 2 THEN (lo >> (c * 16)) & 65535
                      ELSE (hi >> ((c - 2) * 16)) & 65535 END AS chunk
               FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS c)),
        okc AS (SELECT ch.* FROM ch
                JOIN (SELECT c, chunk FROM ch GROUP BY c, chunk
                      HAVING COUNT(*) <= 1000) k
                  ON ch.c = k.c AND ch.chunk = k.chunk),
        mt AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id,
                      x.i AS fa, y.i AS fb
               FROM okc x JOIN okc y
                 ON x.c = y.c AND x.chunk = y.chunk
                    AND x.doc_id < y.doc_id
               WHERE bit_count(xor(x.lo, y.lo))
                     + bit_count(xor(x.hi, y.hi)) <= 3)
        SELECT a_id, b_id, CAST(COUNT(DISTINCT fa) AS BIGINT) AS n_close
        FROM mt GROUP BY a_id, b_id HAVING COUNT(DISTINCT fa) >= 2
        ORDER BY a_id, b_id"""),
      (s, d) => {
        import s.implicits._
        val planted = Seq((950001L, AudPlantA), (950002L, AudPlantB),
          (950003L, AudPlantD)).toDF("doc_id", "text")
        val media = guardPlantIds(
            spread(documents(s, d)).select("doc_id", "text"),
            Seq(950001L, 950002L, 950003L))
          .unionAll(planted)
          .select(col("doc_id"), col("text").cast("binary").as("content"))
          .as[Multimodal.MediaDoc]
        Multimodal.frameBandNearDup(
            Multimodal.audioContourSignatures(
              Multimodal.audioFrameEnergies(media, nFrames = 128).toDF(),
              stride = 8),
            "doc_id", maxDist = 3, minShared = 2)
          .orderBy("a_id", "b_id")
      })

  // ---- q306-q308: DuckDB-replayable rows for the pure-array geo
  // functions (G2 force2D, G4 ST_Multi promotion, G5 ST_AsGeoJSON) —
  // previously spec-only, the last §2 operators outside the hash gate.
  // Fixtures are synthesized from nation.n_nationkey as GeoJSON text
  // with integer-derived coordinates suffixed ".0"/".5", so BOTH
  // engines can assemble bit-identical strings (Spark's to_json /
  // Jackson prints 10.0 as "10.0" and 10.5 as "10.5"; DuckDB
  // concatenates CAST(k AS VARCHAR) with the same suffixes — no
  // engine-varying float formatting anywhere). The JTS simplifier (G3)
  // stays spec-verified: topology-preserving simplification is not
  // SQL-expressible, documented in SURVEY §2.9.

  /** A 4-point closed ring as raw GeoJSON text. `threeD` appends a z
    * coordinate to every point (what force2D must strip). Base
    * coordinates derive from the integer column so both engines print
    * identical literals.
    */
  private def ringJson(b: org.apache.spark.sql.Column, threeD: Boolean)
      : org.apache.spark.sql.Column = {
    val s = b.cast("string")
    val z1 = if (threeD) ",1.0" else ""
    val z2 = if (threeD) ",2.5" else ""
    concat(lit("[["), s, lit(s".0,0.0$z1],["), s, lit(s".5,0.0$z2],["),
      s, lit(s".5,0.5$z1],["), s, lit(s".0,0.0$z1]]"))
  }

  /** The same ring's expected 2-D text, shared by the three oracles'
    * Spark sides only as documentation — the DuckDB mirrors assemble
    * it with `||`.
    */
  private val ringSqlParts =
    ("'[[' || k || '.0,0.0],[' || k || '.5,0.0],[' || k ||" +
      " '.5,0.5],[' || k || '.0,0.0]]'")

  /** G2 / ST_Force2D as an oracle row: MultiPolygon coordinates with a
    * 3-D shell and a 2-D hole (keys divisible by 3) or all-2-D rings
    * (the rest) parse into the typed column, [[wilayah.Geo.force2D]]
    * strips z per point, and [[wilayah.Geo.asGeoJson]] serializes —
    * the mixed-dimensionality case the reference's data actually has.
    * The oracle assembles the expected 2-D GeoJSON text directly.
    */
  private lazy val q306: QueryDef =
    QueryDef("q306_geo_force2d",
      Some(s"""
        WITH n AS (SELECT n_nationkey AS key,
                          CAST(n_nationkey AS VARCHAR) AS k FROM nation),
        r AS (SELECT key, $ringSqlParts AS ring FROM n)
        SELECT key,
               '{"type":"MultiPolygon","coordinates":[[' || ring ||
                 CASE WHEN key % 3 = 0 THEN ',' || ring ELSE '' END ||
                 ']]}' AS geojson
        FROM r ORDER BY key"""),
      (s, d) => {
        val n = nation(s, d).select(col("n_nationkey").as("key"))
        val shell3 = ringJson(col("key"), threeD = true)
        val ring2 = ringJson(col("key"), threeD = false)
        // key % 3 = 0: 3-D shell + 2-D hole; others: one 2-D ring
        val rawCoords = when(col("key") % 3 === 0,
            concat(lit("[["), shell3, lit(","), ring2, lit("]]")))
          .otherwise(concat(lit("[["), ring2, lit("]]")))
        val coords = from_json(rawCoords, graft.wilayah.Model.coordinatesType)
        n.select(col("key"),
            graft.wilayah.Geo.asGeoJson(
              graft.wilayah.Geo.force2D(coords)).as("geojson"))
          .orderBy("key")
      })

  /** G4 / ST_Multi promotion as an oracle row, all four arms of
    * [[wilayah.Geo.promoteMultiParts]]: a bare Polygon wraps once
    * (key % 4 = 0), a MultiPolygon passes through (1), a non-areal
    * type quarantines to NULL (2), and MALFORMED Polygon coordinates
    * quarantine to NULL instead of becoming [null] (3 — the
    * parse-success guard). Output is the promoted GeoJSON text or
    * NULL; the oracle declares each arm's contract directly.
    */
  private lazy val q307: QueryDef =
    QueryDef("q307_geo_promote_multi",
      Some(s"""
        WITH n AS (SELECT n_nationkey AS key,
                          CAST(n_nationkey AS VARCHAR) AS k,
                          CAST(n_nationkey + 1 AS VARCHAR) AS k2
                   FROM nation),
        r AS (SELECT key, $ringSqlParts AS ring,
                     '[[' || k2 || '.0,0.0],[' || k2 || '.5,0.0],[' ||
                       k2 || '.5,0.5],[' || k2 || '.0,0.0]]' AS ring2
              FROM n)
        SELECT key,
               CASE key % 4
                 WHEN 0 THEN '{"type":"MultiPolygon","coordinates":[['
                   || ring || ']]}'
                 WHEN 1 THEN '{"type":"MultiPolygon","coordinates":[['
                   || ring || '],[' || ring2 || ']]}'
                 ELSE NULL
               END AS geojson
        FROM r ORDER BY key"""),
      (s, d) => {
        val n = nation(s, d).select(col("n_nationkey").as("key"))
        val ring = ringJson(col("key"), threeD = false)
        val ringNext = ringJson(col("key") + 1, threeD = false)
        val geomType = element_at(array(lit("Polygon"), lit("MultiPolygon"),
          lit("LineString"), lit("Polygon")),
          (pmod(col("key"), lit(4)) + 1).cast("int"))
        val coordsJson = element_at(array(
          concat(lit("["), ring, lit("]")),                         // Polygon
          concat(lit("[["), ring, lit("],["), ringNext, lit("]]")), // Multi
          ring,                                                     // Line
          lit("\"oops\"")),                              // malformed Polygon
          (pmod(col("key"), lit(4)) + 1).cast("int"))
        val promoted = graft.wilayah.Geo.promoteMultiParts(geomType, coordsJson)
        n.select(col("key"),
            when(promoted.isNotNull,
              graft.wilayah.Geo.asGeoJson(promoted)).as("geojson"))
          .orderBy("key")
      })

  /** G5 / ST_AsGeoJSON through the FULL reference write chain minus
    * the JTS simplifier ([[wilayah.Geo.promoteMultiFromJson]] ->
    * [[wilayah.Geo.force2D]] -> [[wilayah.Geo.asGeoJson]], the
    * server.js:92 normalization): whole GeoJSON geometry strings
    * (type extracted via get_json_object) — 3-D Polygons (even keys)
    * and 2-D two-part MultiPolygons (odd keys) — normalize to the
    * exact 2-D MultiPolygon text the oracle assembles.
    */
  private lazy val q308: QueryDef =
    QueryDef("q308_geo_asgeojson_chain",
      Some(s"""
        WITH n AS (SELECT n_nationkey AS key,
                          CAST(n_nationkey AS VARCHAR) AS k FROM nation),
        r AS (SELECT key, $ringSqlParts AS ring,
                     '[[' || CAST(key + 1 AS VARCHAR) || '.0,0.0],[' ||
                       CAST(key + 1 AS VARCHAR) || '.5,0.0],[' ||
                       CAST(key + 1 AS VARCHAR) || '.5,0.5],[' ||
                       CAST(key + 1 AS VARCHAR) || '.0,0.0]]' AS ring2
              FROM n)
        SELECT key,
               CASE WHEN key % 2 = 0
                 THEN '{"type":"MultiPolygon","coordinates":[[' || ring
                   || ']]}'
                 ELSE '{"type":"MultiPolygon","coordinates":[[' || ring
                   || '],[' || ring2 || ']]}'
               END AS geojson
        FROM r ORDER BY key"""),
      (s, d) => {
        val n = nation(s, d).select(col("n_nationkey").as("key"))
        val ring3 = ringJson(col("key"), threeD = true)
        val ring2 = ringJson(col("key"), threeD = false)
        val ringNext = ringJson(col("key") + 1, threeD = false)
        val geomJson = when(col("key") % 2 === 0,
            concat(lit("{\"type\":\"Polygon\",\"coordinates\":["),
              ring3, lit("]}")))
          .otherwise(
            concat(lit("{\"type\":\"MultiPolygon\",\"coordinates\":[["),
              ring2, lit("],["), ringNext, lit("]]}")))
        n.select(col("key"),
            graft.wilayah.Geo.asGeoJson(
              graft.wilayah.Geo.force2D(
                graft.wilayah.Geo.promoteMultiFromJson(geomJson)))
              .as("geojson"))
          .orderBy("key")
      })

  val all: Seq[QueryDef] = Seq(q304, q305, q306, q307, q308)
}
