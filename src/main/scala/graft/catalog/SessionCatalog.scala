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
  /** Separator for the partition-column list property — U+001F, never a
   * legal column-name character, so names containing commas round-trip
   * (the in-memory impl preserves them; this adapter must too). */
  private val PartSep = "\u001f"

  private def sc = spark.sessionState.catalog

  private def ident(db: String, table: String) =
    TableIdentifier(table.toLowerCase, Some(db.toLowerCase))

  /** Hadoop-Path parsing, not `new URI(...)`: locations with spaces or
   * other URI-illegal characters are legal everywhere else in the engine
   * (every store goes through Path), so the catalog must accept them. */
  private def toUri(location: String): URI =
    new org.apache.hadoop.fs.Path(location).toUri

  private def ensureDb(db: String): Unit = {
    val name = db.toLowerCase
    if (!sc.databaseExists(name)) {
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      sc.createDatabase(
        CatalogDatabase(name, s"graft database $name",
          toUri(s"$warehouse/$name.db"), Map.empty),
        ignoreIfExists = true)
    }
  }

  override def register(meta: TableMeta): Unit = {
    ensureDb(meta.db)
    val id = ident(meta.db, meta.name)
    val props = meta.properties ++
      (if (meta.hasPrimaryKey)
        Map(PkProp -> meta.primaryKey.mkString(PartSep)) else Map.empty) ++
      (if (meta.partitionBy.nonEmpty)
        Map(PartProp -> meta.partitionBy.mkString(PartSep)) else Map.empty)
    val table = CatalogTable(
      identifier = id,
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty.copy(
        locationUri = Some(toUri(meta.location))),
      schema = meta.schema.getOrElse(new StructType()),
      provider = Some(meta.format),
      properties = props)
    // last registration wins (the InMemoryCatalog contract — schema
    // re-registration after every landing write depends on it), WITHOUT
    // a drop+create window: alter in place when the table exists, and
    // fall back to alter if a concurrent register won the create race —
    // readers never observe the table missing
    if (sc.tableExists(id)) alterInPlace(id, table)
    else
      try sc.createTable(table, ignoreIfExists = false)
      catch {
        case _: org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException =>
          alterInPlace(id, table)
      }
  }

  /** Full in-place refresh of an existing entry. `alterTable` carries
   * properties/location/format, but a HIVE-backed external catalog
   * explicitly IGNORES schema changes on that path
   * (`HiveExternalCatalog.alterTable` — schema travels only through the
   * dedicated dataSchema call), so re-checking after the alter and
   * pushing a differing schema through `alterTableDataSchema` is what
   * makes "last registration wins" hold on a real metastore, not just
   * on the in-memory catalog. An empty incoming schema is "unknown",
   * never a wipe.
   *
   * The dataSchema path itself refuses NON-ADDITIVE changes (Spark's
   * `alterTableDataSchema` throws when any existing column is missing
   * from the new schema), so a re-registration that drops or renames a
   * column — a domain whose definition SQL narrowed — would crash on a
   * real metastore while winning on the in-memory one. For that case
   * the only metastore-portable route is drop + recreate; the brief
   * missing-table window it opens is confined to the rare narrowing
   * re-registration (additive refreshes, the landing-write common case,
   * stay windowless on the in-place path). */
  private def alterInPlace(id: TableIdentifier, table: CatalogTable): Unit = {
    sc.alterTable(table)
    val current = sc.getTableMetadata(id).schema
    if (table.schema.nonEmpty && current != table.schema) {
      val have = current.map(_.name.toLowerCase).toSet
      val want = table.schema.map(_.name.toLowerCase).toSet
      if (have.subsetOf(want)) sc.alterTableDataSchema(id, table.schema)
      else {
        // narrowing re-registration: drop + recreate is the only
        // metastore-portable route. If the recreate FAILS, restore the
        // previously-fetched registration — without the restore a failed
        // recreate loses the table from the metastore permanently, far
        // worse than the documented brief missing-table window the drop
        // itself opens (the restore is best-effort: a metastore that
        // cannot create at all keeps the original failure as the cause).
        val previous = sc.getTableMetadata(id)
        sc.dropTable(id, ignoreIfNotExists = true, purge = false)
        try sc.createTable(table, ignoreIfExists = false)
        catch {
          case scala.util.control.NonFatal(e) =>
            try sc.createTable(previous, ignoreIfExists = true)
            catch { case scala.util.control.NonFatal(_) => () }
            throw e
        }
      }
    }
  }

  override def get(db: String, table: String): Option[TableMeta] =
    try {
      val ct = sc.getTableMetadata(ident(db, table))
      Some(toMeta(ct))
    } catch {
      case _: NoSuchTableException | _: NoSuchDatabaseException => None
    }

  override def list(db: String): Seq[TableMeta] =
    try {
      // catalog TABLES only (listTables also surfaces session-local temp
      // views, which are not catalog entries and can shadow-duplicate a
      // registered name), fetched as ONE batch metastore call rather
      // than a metadata round-trip per table
      val ids = sc.listTables(db.toLowerCase, "*", includeLocalTempViews = false)
      // a SHARED metastore database can hold objects this adapter never
      // wrote — views, foreign tables, location-less entries. Listing
      // skips them instead of letting one foreign object crash the whole
      // listing; get() on a directly addressed table still throws on a
      // location-less entry (addressing it by name IS the error there)
      sc.getTablesByName(ids)
        .filter(ct => ct.storage.locationUri.isDefined &&
          (ct.tableType == CatalogTableType.EXTERNAL ||
            ct.tableType == CatalogTableType.MANAGED))
        .map(toMeta)
    } catch { case _: NoSuchDatabaseException => Seq.empty }

  override def listAll: Seq[TableMeta] =
    sc.listDatabases().flatMap(list)

  /** Metadata-only drop (purge = false always — the STORE owns data
   * lifecycle; its dropTable purges through the filesystem itself). */
  override def unregister(db: String, table: String): Unit =
    try sc.dropTable(ident(db, table), ignoreIfNotExists = true,
      purge = false)
    catch { case _: NoSuchDatabaseException => () }

  private def toMeta(ct: CatalogTable): TableMeta =
    TableMeta(
      db = ct.identifier.database.getOrElse(""),
      name = ct.identifier.table,
      location = ct.storage.locationUri
        .map(u => new org.apache.hadoop.fs.Path(u).toString)
        .getOrElse(throw new IllegalStateException(
          s"catalog table ${ct.identifier} has no location")),
      format = ct.provider.getOrElse("parquet"),
      primaryKey = ct.properties.get(PkProp)
        .map(_.split(PartSep).toSeq.filter(_.nonEmpty)).getOrElse(Nil),
      partitionBy = ct.properties.get(PartProp)
        .map(_.split(PartSep).toSeq.filter(_.nonEmpty)).getOrElse(Nil),
      properties = ct.properties -- AdapterProps,
      schema = Some(ct.schema).filter(_.nonEmpty))
}
