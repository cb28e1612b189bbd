package graft.wilayah

import java.io.File
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GeoJSON ingest: file discovery, level inference, feature un-nesting,
  * and hierarchical code/name synthesis — the ETL front half of the
  * reference's `POST /api/db/sync` (/root/reference/server.js:340-378),
  * re-expressed as one declarative Spark read + column expressions so
  * Catalyst parallelizes per-file and the whole transform stays in
  * whole-stage codegen (vs the reference's sequential per-feature loop,
  * /root/reference/server.js:368-375).
  */
object Ingest {

  /** File discovery for a sync code: name starts with the code and ends
    * with `.geojson` (/root/reference/server.js:347).
    */
  def discover(geojsonDir: String, code: String): Seq[String] = {
    val dir = new File(geojsonDir)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .map(_.getName).toSeq.sorted
      .filter(n => n.startsWith(code) && n.endsWith(".geojson"))
      .map(n => s"$geojsonDir/$n")
  }

  /** Passthrough discovery: 2-char codes use the stricter
    * `^CODE_[^_]+\.geojson$` (exactly the province boundary file, not
    * `11.01_*` children — /root/reference/server.js:522-525); longer
    * codes fall back to prefix matching.
    */
  def discoverExact(geojsonDir: String, code: String): Seq[String] = {
    val dir = new File(geojsonDir)
    val names = Option(dir.listFiles()).getOrElse(Array.empty).map(_.getName).toSeq.sorted
    val matched =
      if (code.length == 2) {
        val re = ("^" + java.util.regex.Pattern.quote(code) + "_[^_]+\\.geojson$").r
        names.filter(n => re.findFirstIn(n).isDefined)
      } else names.filter(n => n.startsWith(code) && n.endsWith(".geojson"))
    matched.map(n => s"$geojsonDir/$n")
  }

  /** Admin level from the filename — content is never consulted
    * (/root/reference/server.js:363-366). Note `11.01_Aceh_Selatan
    * .geojson` is level 2, NOT 1: its 3rd char is `.`, so the
    * two-digit-then-underscore level-1 regex does not match.
    */
  def levelOfFileName(name: Column): Column =
    when(name.endsWith("_kecamatan.geojson"), 3)
      .when(name.endsWith("_kelurahan.geojson"), 4)
      .when(name.rlike("^[0-9]{2}_"), 1)
      .otherwise(2)

  /** Scala mirror for driver-side dispatch (passthrough slots). */
  def levelOfFileName(name: String): Int =
    if (name.endsWith("_kecamatan.geojson")) 3
    else if (name.endsWith("_kelurahan.geojson")) 4
    else if (name.matches("^\\d{2}_.*")) 1
    else 2

  /** FeatureCollection un-nest: raw multiLine-read rows -> one feature
    * per row with `level` inferred from the source filename. Shared by
    * the batch reader below and the streaming source (Streams.scala) so
    * the two ingest paths cannot drift.
    */
  def unnest(raw: DataFrame): DataFrame =
    raw
      .select(
        element_at(split(input_file_name(), "/"), -1).as("file_name"),
        explode(col("features")).as("f"))
      .select(
        col("file_name"),
        levelOfFileName(col("file_name")).as("level"),
        col("f.properties").as("p"),
        col("f.geometry").as("geometry"))

  /** Read GeoJSON FeatureCollection files into one feature-per-row
    * DataFrame: multiLine JSON with the explicit merged schema.
    * Columns: file_name, level, properties, geometry.
    */
  def readFeatures(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "no geojson files matched")
    unnest(spark.read
      .option("multiLine", true)
      .schema(Model.featureCollectionSchema)
      .json(paths: _*))
  }

  /** Feature rows -> warehouse-shaped rows: code/name synthesis, the
    * clean gate (quarantine drop), geometry normalization, and batch
    * timestamps — the single transform both the batch sync
    * (Api.syncPaths) and the streaming sync (Streams.ingestStream)
    * apply, so merge semantics cannot diverge between them.
    */
  def warehouseRows(features: DataFrame): DataFrame = {
    val now = current_timestamp()
    withKodeNama(features)
      .filter(clean)
      .select(
        col("kode_wilayah_kemendagri"),
        col("nama_wilayah_kemendagri"),
        col("level"),
        Geo.normalizeToGeoJson(col("geometry.type"), col("geometry.coordinates"))
          .as("geometry"),
        now.as("created_at"),
        now.as("updated_at"))
  }

  /** Hierarchical code + display name per level — the
    * `transformProperties` dispatch (/root/reference/server.js:160-185):
    * L1 `kd_propinsi`; L2 `kd_propinsi.kd_dati2`; L3 appends the LAST
    * TWO digits of the 3-digit `kd_kecamatan` (`.slice(-2)`,
    * server.js:173); L4 appends `'2' + kd_kelurahan` (3-digit raw
    * becomes a `2xxx` village code, server.js:179).
    *
    * Divergence from the reference (documented, intentional): missing
    * properties yield NULL kode/nama (quarantine-able) instead of JS
    * `"undefined"` string concatenation.
    */
  def withKodeNama(features: DataFrame): DataFrame = {
    val kec2 = substring(col("p.kd_kecamatan"), -2, 2)
    val kode = when(col("level") === 1, col("p.kd_propinsi"))
      .when(col("level") === 2, concat_ws(".", col("p.kd_propinsi"), col("p.kd_dati2")))
      .when(col("level") === 3,
        concat_ws(".", col("p.kd_propinsi"), col("p.kd_dati2"), kec2))
      .otherwise(concat_ws(".", col("p.kd_propinsi"), col("p.kd_dati2"), kec2,
        concat(lit("2"), col("p.kd_kelurahan"))))
    val nama = when(col("level") === 1, col("p.nm_propinsi"))
      .when(col("level") === 2, col("p.nm_dati2"))
      .when(col("level") === 3, col("p.nm_kecamatan"))
      .otherwise(col("p.nm_kelurahan"))
    // concat_ws skips nulls, which would silently build a short code
    // from partial properties — null the whole kode instead when any
    // required component is missing.
    val required = Map(
      1 -> Seq("kd_propinsi"),
      2 -> Seq("kd_propinsi", "kd_dati2"),
      3 -> Seq("kd_propinsi", "kd_dati2", "kd_kecamatan"),
      4 -> Seq("kd_propinsi", "kd_dati2", "kd_kecamatan", "kd_kelurahan"))
    val complete = (1 to 4).map { l =>
      (col("level") === l) && required(l).map(c => col(s"p.$c").isNotNull).reduce(_ && _)
    }.reduce(_ || _)
    features
      .withColumn("kode_wilayah_kemendagri", when(complete, kode))
      .withColumn("nama_wilayah_kemendagri", nama)
  }

  /** Predicate selecting rows fit for the warehouse: a derivable key
    * AND a promotable, PARSEABLE geometry — MultiPolygon passes
    * through, a bare Polygon wraps to MultiPolygon (the read schema
    * carries coordinates as raw JSON text precisely so
    * Geo.promoteMultiParts can dispatch on nesting depth). The
    * promotion result itself is the gate: an unpromotable type OR
    * coordinates text that fails to parse both yield NULL, and either
    * belongs in [[quarantine]] rather than being stored as
    * coordinate-less geometry text.
    */
  def clean: Column =
    col("kode_wilayah_kemendagri").isNotNull &&
      Geo.promoteMultiParts(col("geometry.type"), col("geometry.coordinates")).isNotNull

  /** Rows withKodeNama could not derive a key for (missing required
    * properties for their level), or whose geometry is not a promotable
    * MultiPolygon — the quarantine stream. The reference silently
    * writes `"undefined"`-laced codes (/root/reference/server.js:160-185
    * via JS string interpolation) and null-geometry rows instead; we
    * surface them for inspection and keep them out of the warehouse.
    */
  def quarantine(withCodes: DataFrame): DataFrame =
    withCodes.filter(!clean)
      .select(col("file_name"), col("level"), col("p").as("properties"),
        col("geometry.type").as("geometry_type"))
}
