package graft.wilayah

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory, LinearRing, MultiPolygon, Polygon}
import org.locationtech.jts.simplify.TopologyPreservingSimplifier

/** Geometry kernels — the reference's PostGIS surface
  * (`ST_Force2D`, `ST_SimplifyPreserveTopology`, `ST_Multi`,
  * `ST_AsGeoJSON`, applied at /root/reference/server.js:92 and
  * /root/reference/init_db.sql:29,53,76).
  *
  * Force2D and the GeoJSON (de)serialization are pure built-in
  * expressions (higher-order array transforms + to_json) so they stay
  * in whole-stage codegen. Topology-preserving simplification is the
  * one genuinely custom kernel: JTS's TopologyPreservingSimplifier —
  * the same algorithm PostGIS/GEOS implements — wrapped in a UDF over
  * the nested coordinates arrays.
  */
object Geo {

  /** PostGIS default tolerance used by the reference: 0.0001 deg
    * (~11 m) — /root/reference/init_db.sql:29.
    */
  val SimplifyTolerance = 1e-4

  /** ST_Force2D: drop Z from every point (inputs mix 2-D and 3-D
    * rings). Pure array transforms — codegen'd, no UDF.
    */
  def force2D(coords: Column): Column =
    transform(coords, poly =>
      transform(poly, ring =>
        transform(ring, pt => slice(pt, 1, 2))))

  /** Full ST_Multi contract (/root/reference/init_db.sql:29) over
    * (geometry type, RAW coordinates JSON text): a MultiPolygon's
    * coordinates parse 4-deep and pass through; a bare Polygon's parse
    * 3-deep and wrap once — exactly PostGIS's promotion. The text form
    * exists because the wrap changes nesting depth, which is only
    * expressible before the coordinates are parsed into a typed
    * column. Other geometry types yield NULL (the sync paths quarantine
    * those rows via Ingest.clean).
    */
  def promoteMultiParts(geomType: Column, coordsJson: Column): Column = {
    val poly = from_json(coordsJson, Model.polygonCoordinatesType)
    when(geomType === "MultiPolygon", from_json(coordsJson, Model.coordinatesType))
      // the parse-success guard matters: array(NULL) is NOT null, so an
      // unguarded wrap would turn malformed Polygon coordinates into a
      // one-element [null] MultiPolygon instead of a quarantine-able NULL
      .when(geomType === "Polygon" && poly.isNotNull, array(poly))
  }

  /** [[promoteMultiParts]] over a whole GeoJSON geometry string. */
  def promoteMultiFromJson(geomJson: Column): Column =
    promoteMultiParts(
      get_json_object(geomJson, "$.type"),
      get_json_object(geomJson, "$.coordinates"))

  /** ST_AsGeoJSON: geometry struct -> GeoJSON text. */
  def asGeoJson(coords: Column): Column =
    to_json(struct(lit("MultiPolygon").as("type"), coords.as("coordinates")))

  type Coords = Seq[Seq[Seq[Seq[Double]]]]

  /** ST_SimplifyPreserveTopology(geom, tol): Douglas-Peucker-style
    * vertex reduction that never collapses rings or introduces
    * self-intersections — JTS's TopologyPreservingSimplifier, which is
    * the algorithm behind the PostGIS function the reference calls.
    * Operates on force2D'd coordinates.
    */
  def simplifyCoords(coords: Coords, tolerance: Double): Coords = {
    val gf = new GeometryFactory()
    def ring(pts: Seq[Seq[Double]]): LinearRing =
      gf.createLinearRing(pts.map(p => new Coordinate(p(0), p(1))).toArray)
    val polys: Array[Polygon] = coords.map { rings =>
      gf.createPolygon(ring(rings.head), rings.tail.map(ring).toArray)
    }.toArray
    val mp: MultiPolygon = gf.createMultiPolygon(polys)
    val simplified = TopologyPreservingSimplifier.simplify(mp, tolerance)
    // read back to nested arrays; result may degrade to a single Polygon
    val outPolys: Seq[Polygon] = simplified match {
      case m: MultiPolygon =>
        (0 until m.getNumGeometries).map(m.getGeometryN(_).asInstanceOf[Polygon])
      case p: Polygon => Seq(p)
      case other => throw new IllegalStateException(
        s"simplify produced ${other.getGeometryType}")
    }
    outPolys.map { p =>
      val shells = p.getExteriorRing +:
        (0 until p.getNumInteriorRing).map(p.getInteriorRingN)
      shells.map(_.getCoordinates.toSeq.map(c => Seq(c.x, c.y)))
    }
  }

  /** Column form of [[simplifyCoords]] at the reference tolerance.
    * A geometry JTS rejects (open ring, < 4 points) passes through
    * UNSIMPLIFIED instead of failing the whole sync batch — geometry
    * reduction is a storage optimization, not a correctness
    * requirement, so degraded is better than dead.
    */
  val simplifyUdf = udf((coords: Coords) =>
    if (coords == null) null
    else
      try simplifyCoords(coords, SimplifyTolerance)
      catch { case _: Exception => coords })

  /** Full write-path normalization: Multi (promotion from the raw
    * coordinates text) -> Force2D -> SimplifyPreserveTopology ->
    * GeoJSON text (the upsert expression at
    * /root/reference/server.js:92). `coordsJson` is the raw JSON
    * coordinates string of the read schema (Model.geometryRawType).
    */
  def normalizeToGeoJson(geomType: Column, coordsJson: Column): Column =
    asGeoJson(simplifyUdf(force2D(promoteMultiParts(geomType, coordsJson))))
}
