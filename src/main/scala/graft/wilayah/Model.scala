package graft.wilayah

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Data model for the wilayah (administrative-region) engine.
  *
  * Warehouse row mirrors the reference's single PostGIS table
  * `m_wilayah_poligon` (/root/reference/init_db.sql:5-12): a dotted
  * hierarchical code as the enforced-unique key, a display name, the
  * admin level (1=provinsi .. 4=kelurahan/desa), and the boundary
  * geometry — carried here as a GeoJSON string column (Spark has no
  * native geometry type; see Geo.scala for the typed in-flight form).
  */
case class Wilayah(
    kode_wilayah_kemendagri: String,
    nama_wilayah_kemendagri: String,
    level: Int,
    geometry: String,
    created_at: Timestamp,
    updated_at: Timestamp)

object Model {

  /** MultiPolygon coordinates: polygons -> rings -> points -> doubles.
    * The innermost array is length 2 or 3 — the corpus mixes 2-D and
    * 3-D (constant Z=0) points, which is why ingest applies force2D
    * (reference applies ST_Force2D at /root/reference/server.js:92).
    */
  val coordinatesType: DataType =
    ArrayType(ArrayType(ArrayType(ArrayType(DoubleType))))

  /** Bare Polygon coordinates (one level shallower: rings -> points ->
    * doubles) — the input shape ST_Multi promotes (Geo.promoteMultiFromJson).
    */
  val polygonCoordinatesType: DataType =
    ArrayType(ArrayType(ArrayType(DoubleType)))

  /** Level-variant feature properties (consumed at
    * /root/reference/server.js:160-185), merged into one nullable
    * struct so a single schema reads every level's files.
    */
  val propertiesType: StructType = StructType(Seq(
    StructField("kd_propinsi", StringType),
    StructField("nm_propinsi", StringType),
    StructField("kd_dati2", StringType),
    StructField("nm_dati2", StringType),
    StructField("kd_kecamatan", StringType),
    StructField("nm_kecamatan", StringType),
    StructField("kd_kelurahan", StringType),
    StructField("nm_kelurahan", StringType)))

  val geometryType: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("coordinates", coordinatesType)))

  /** Read-side geometry: coordinates captured as the RAW JSON text
    * (Spark's JSON reader returns the unparsed token for a StringType
    * field). This is what lets ST_Multi truly promote: a MultiPolygon's
    * 4-deep and a Polygon's 3-deep coordinates cannot share one typed
    * column, so the nesting dispatch (Geo.promoteMultiParts) must see
    * the text BEFORE parsing.
    */
  val geometryRawType: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("coordinates", StringType)))

  val featureType: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("properties", propertiesType),
    StructField("geometry", geometryRawType)))

  /** GeoJSON FeatureCollection file schema (explicit — the reference
    * duck-types via JSON.parse at /root/reference/server.js:361; we
    * validate instead, PERMISSIVE nulls replacing its silent
    * `"undefined"` string propagation).
    */
  val featureCollectionSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("features", ArrayType(featureType))))
}
