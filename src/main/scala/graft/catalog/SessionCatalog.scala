package graft.catalog

import java.net.URI

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{NoSuchDatabaseException, NoSuchTableException}
import org.apache.spark.sql.catalyst.catalog.{CatalogDatabase, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.types.StructType

/**
 * [[Catalog]] backed by Spark's SESSION catalog — the external-metastore
 * seam made real against the catalog client Spark itself ships: the same
 * `spark.sessionState.catalog` surface a cluster deployment points at its
 * Hive metastore / Glue HMS endpoint (swap the metastore by Spark conf,
 * not by code — `spark.sql.catalogImplementation=hive` plus the usual
 * metastore URIs turns THIS class into a Glue/HMS-backed catalog with
 * zero changes here). The reference keeps its primary key as a Glue
 * table parameter (`Parameters['PK']`, reference
 * dev/_get_schema_from_glue.py:108-123); this catalog does exactly that
 * with table properties (`graft.pk`, `graft.partitionBy`).
 *
 * Tables register as EXTERNAL metadata entries (location-pointing, no
 * data movement, no schema inference at create — the store owns the
 * files and their versioned layout); an absent/empty schema round-trips
 * as None. Unlike [[InMemoryCatalog]] the registrations survive anything
 * that shares the metastore, which is the point of an external catalog.
 */
final class SessionCatalog(spark: SparkSession) extends Catalog {

  private val PkProp = "graft.pk"
  private val PartProp = "graft.partitionBy"
  /** Properties this adapter writes; everything else in the table's
   * property map belongs to the caller's `properties`. */
  private val AdapterProps = Set(PkProp, PartProp)

  private def sc = spark.sessionState.catalog

  private def ident(db: String, table: String) =
    TableIdentifier(table.toLowerCase, Some(db.toLowerCase))

  private def ensureDb(db: String): Unit = {
    val name = db.toLowerCase
    if (!sc.databaseExists(name)) {
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      sc.createDatabase(
        CatalogDatabase(name, s"graft database $name",
          new URI(s"$warehouse/$name.db"), Map.empty),
        ignoreIfExists = true)
    }
  }

  override def register(meta: TableMeta): Unit = {
    ensureDb(meta.db)
    val id = ident(meta.db, meta.name)
    val props = meta.properties ++
      meta.primaryKey.map(PkProp -> _).toMap ++
      (if (meta.partitionBy.nonEmpty)
        Map(PartProp -> meta.partitionBy.mkString(",")) else Map.empty)
    val table = CatalogTable(
      identifier = id,
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty.copy(
        locationUri = Some(new URI(meta.location))),
      schema = meta.schema.getOrElse(new StructType()),
      provider = Some(meta.format),
      properties = props)
    // last registration wins, the InMemoryCatalog contract (schema
    // re-registration after every landing write depends on it)
    if (sc.tableExists(id)) sc.dropTable(id, ignoreIfNotExists = true,
      purge = false)
    sc.createTable(table, ignoreIfExists = false)
  }

  override def get(db: String, table: String): Option[TableMeta] =
    try {
      val ct = sc.getTableMetadata(ident(db, table))
      Some(toMeta(ct))
    } catch {
      case _: NoSuchTableException | _: NoSuchDatabaseException => None
    }

  override def list(db: String): Seq[TableMeta] =
    try sc.listTables(db.toLowerCase)
      .flatMap(id => get(db, id.table))
    catch { case _: NoSuchDatabaseException => Seq.empty }

  private def toMeta(ct: CatalogTable): TableMeta =
    TableMeta(
      db = ct.identifier.database.getOrElse(""),
      name = ct.identifier.table,
      location = ct.storage.locationUri
        .map(u => new org.apache.hadoop.fs.Path(u).toString)
        .getOrElse(throw new IllegalStateException(
          s"catalog table ${ct.identifier} has no location")),
      format = ct.provider.getOrElse("parquet"),
      primaryKey = ct.properties.get(PkProp),
      partitionBy = ct.properties.get(PartProp)
        .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil),
      properties = ct.properties -- AdapterProps,
      schema = Some(ct.schema).filter(_.nonEmpty))
}
