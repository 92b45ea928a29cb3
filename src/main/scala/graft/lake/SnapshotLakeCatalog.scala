package graft.lake

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, not}
import org.apache.spark.sql.types.{DataType, StructType}

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** The snapshot-committing [[LakeCatalog]] family: Iceberg-style versioned
  * table metadata (schema + partition/bucket spec + a snapshot log whose
  * current entry lists the LIVE data directories) committed through an
  * optimistic-concurrency loop, with the data plane (per-snapshot parquet
  * directories, read-time schema alignment, time travel, snapshot expiry,
  * compaction) shared across carriers.
  *
  * Concrete subclasses supply only the METADATA CARRIER — where the
  * versioned document lives and what makes a commit atomic:
  *   - [[DirectoryLakeCatalog]]: HadoopCatalog file convention, link(2) as
  *     the compare-and-swap;
  *   - [[RestLakeCatalog]]: the Iceberg REST catalog protocol, the
  *     server's version check as the compare-and-swap (what the reference
  *     relies on, `/root/reference/target_iceberg/sinks.py:55-65`).
  * Everything above the carrier — commit rebase semantics, evolution,
  * append/overwrite/bucketed writes, snapshot reads — is ONE
  * implementation, so the matrix spec's lifecycle contract cannot drift
  * between carriers.
  *
  * Commit model: every write lands in a fresh `data/snap-<id>/` directory
  * first (commit-agnostic: the directory name carries a UUID, so racing
  * writers never share one), then the commit loop fetches the current
  * metadata, derives the new version against it, and asks the carrier to
  * publish iff the base is unchanged ([[casMeta]]). A loser re-fetches the
  * winner's metadata and re-derives — e.g. a racing append rebases to
  * live = winner's live + its own directory — bounded by
  * [[MaxCommitRetries]] with a loud failure. Readers never observe a
  * half-written snapshot: data files are complete before the metadata
  * version naming them exists.
  */
abstract class SnapshotLakeCatalog(spark: SparkSession) extends LakeCatalog {
  protected val mapper = new ObjectMapper()

  val MaxCommitRetries = 10

  // ---- carrier contract ------------------------------------------------

  /** Current (version, metadata document), or None if the table has no
    * committed metadata. */
  protected def fetchMeta(ns: String, table: String): Option[(Int, ObjectNode)]

  /** Publish `meta` as version `base`+1 iff the current version is still
    * `base` (0 = table creation). MUST be atomic. True = committed;
    * false = lost the race (caller re-fetches and re-derives). */
  protected def casMeta(ns: String, table: String, base: Int,
                        meta: ObjectNode): Boolean

  /** Root of the table's snapshot data directories. */
  protected def dataDir(ns: String, table: String): Path

  /** Where snapshot manifest-list files live — the table's `metadata/`
    * directory, as in Iceberg proper. Keeping them OUT of `data/` keeps the
    * storage audit's data-byte math exact (expiry's reclaimable-bytes
    * promise is measured over data dirs only). */
  protected def manifestDir(ns: String, table: String): Path =
    dataDir(ns, table).getParent.resolve("metadata")

  // ---- commit loop -----------------------------------------------------

  override def tableExists(ns: String, table: String): Boolean =
    fetchMeta(ns, table).isDefined

  protected def readMeta(ns: String, table: String): ObjectNode =
    migrateLegacy(ns, table, fetchMeta(ns, table)
      .getOrElse(throw new IllegalStateException(
        s"$ns.$table does not exist"))._2)

  /** In-place upgrade of a metadata document written before the Iceberg v2
    * layout (single `schema` node, `partition-spec` string array,
    * `current-snapshot-id` doubling as the id counter with 0 = none).
    * Already-v2 documents pass through untouched; a migrated document is
    * only PERSISTED by its next write commit — reads never write. Old
    * snapshot entries keep their `{snapshot-id, operation, live}` shape
    * (every internal reader of the new per-snapshot fields tolerates their
    * absence); synthesized snapshot-log timestamps are 0 = unknown. */
  private def migrateLegacy(ns: String, table: String,
                            meta: ObjectNode): ObjectNode = {
    if (meta.has("schemas")) return meta
    val oldSchema = meta.get("schema").asInstanceOf[ObjectNode]
    oldSchema.put("schema-id", 0)
    meta.putArray("schemas").add(oldSchema)
    meta.remove("schema")
    meta.put("current-schema-id", 0)
    meta.put("last-column-id", oldSchema.get("fields").size())
    val names = oldSchema.get("fields").elements().asScala
      .map(_.get("name").asText()).toSeq
    val spec = mapper.createObjectNode()
    spec.put("spec-id", 0)
    val specFields = spec.putArray("fields")
    val partCols = Option(meta.get("partition-spec"))
      .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty)
    partCols.zipWithIndex.foreach { case (c, i) =>
      val f = specFields.addObject()
      f.put("name", c)
      f.put("transform", "identity")
      f.put("source-id", names.indexOf(c) + 1)
      f.put("field-id", 1000 + i)
    }
    meta.remove("partition-spec")
    meta.putArray("partition-specs").add(spec)
    meta.put("default-spec-id", 0)
    meta.put("last-partition-id", 999 + partCols.size)
    val order = mapper.createObjectNode()
    order.put("order-id", 0)
    order.putArray("fields")
    meta.putArray("sort-orders").add(order)
    meta.put("default-sort-order-id", 0)
    meta.putObject("properties")
    meta.put("location", dataDir(ns, table).getParent.toString)
    val lastId = meta.get("current-snapshot-id").asLong()
    meta.put("last-sequence-number", lastId)
    if (lastId == 0L) meta.put("current-snapshot-id", -1L)
    val log = meta.putArray("snapshot-log")
    meta.get("snapshots").elements().asScala.foreach { sn =>
      val e = log.addObject()
      e.put("timestamp-ms", 0L)
      e.put("snapshot-id", sn.get("snapshot-id").asLong())
    }
    meta.putArray("metadata-log")
    meta
  }

  /** The multi-writer commit loop. `update` sees the current committed
    * metadata (None = table not yet created) and returns the metadata to
    * publish, or None to publish nothing. On a lost race the loop
    * re-fetches the winner's metadata and re-runs `update` against it, so
    * a rebased commit is derived from the base it actually lands on — no
    * snapshot is ever silently overwritten. */
  protected def commit(ns: String, table: String)
                      (update: Option[ObjectNode] => Option[ObjectNode]): Unit = {
    var attempt = 0
    while (true) {
      val cur = fetchMeta(ns, table)
      update(cur.map(t => migrateLegacy(ns, table, t._2))) match {
        case None => return
        case Some(meta) =>
          meta.put("last-updated-ms", System.currentTimeMillis())
          if (casMeta(ns, table, cur.map(_._1).getOrElse(0), meta)) return
          attempt += 1
          if (attempt >= MaxCommitRetries)
            throw new IllegalStateException(
              s"lost the commit race on $ns.$table $MaxCommitRetries times")
      }
    }
  }

  // ---- metadata document -----------------------------------------------
  //
  // The document follows the PUBLIC Iceberg v2 table-metadata field layout
  // (the spec pyiceberg 0.6.1 implements for the reference,
  // `/root/reference/target_iceberg/sinks.py:96-100`): format-version,
  // table-uuid, location, last-sequence-number, last-updated-ms,
  // last-column-id, schemas/current-schema-id, partition-specs/
  // default-spec-id/last-partition-id, sort-orders/default-sort-order-id,
  // properties, current-snapshot-id, snapshots (snapshot-id,
  // parent-snapshot-id, sequence-number, timestamp-ms, manifest-list,
  // summary.operation, schema-id), snapshot-log, metadata-log.
  // DOCUMENTED DIVERGENCES, only where the spec demands Avro or where the
  // sandbox cannot (IcebergMetadataSpec pins both the conformant fields
  // and these):
  //  - `manifest-list` points at a JSON file (list of
  //    {manifest-path, content} entries naming this snapshot's data dirs)
  //    instead of an Avro manifest list — no Avro writer in the jar-less
  //    sandbox; each snapshot also carries a `live` array (the same dir
  //    set inline) which is what THIS catalog's reader uses.
  //  - nested field `type`s (array/map/struct) are Spark catalogStrings,
  //    not the spec's nested type objects; primitives use Iceberg names.
  //  - each schema object carries an extra `spark-schema` node (the exact
  //    StructType JSON this catalog round-trips); extra fields are legal —
  //    Iceberg readers ignore unknown fields.

  /** Spark catalogString → Iceberg primitive type name. Nested types keep
    * the Spark string (documented divergence above). */
  private def icebergType(catalogString: String): String =
    catalogString match {
      case "bigint"                   => "long"
      case "smallint" | "tinyint"     => "int"
      case "timestamp"                => "timestamptz"
      case "timestamp_ntz"            => "timestamp"
      case other                      => other // int/string/double/float/
                                               // boolean/date/binary/
                                               // decimal(p,s) already match
    }

  /** One spec-layout schema object: struct type, schema-id, field list
    * with id/name/required/type (ids assigned at the top level, the simple
    * half of SchemaConv's Singer assignment), plus the exact Spark schema
    * JSON as the `spark-schema` extension this catalog round-trips. */
  private def schemaNode(schema: StructType, schemaId: Int): ObjectNode = {
    val node = mapper.createObjectNode()
    node.put("type", "struct")
    node.put("schema-id", schemaId)
    val fields = node.putArray("fields")
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fn = fields.addObject()
      fn.put("id", i + 1)
      fn.put("name", f.name)
      fn.put("required", !f.nullable)
      fn.put("type", icebergType(f.dataType.catalogString))
    }
    node.put("spark-schema", schema.json)
    node
  }

  private def currentSchemaNode(meta: ObjectNode): JsonNode = {
    val cur = meta.get("current-schema-id").asInt()
    meta.get("schemas").elements().asScala
      .find(_.get("schema-id").asInt() == cur)
      .getOrElse(throw new IllegalStateException(
        s"current-schema-id $cur missing from schemas"))
  }

  private def metaSchema(meta: ObjectNode): StructType =
    DataType.fromJson(currentSchemaNode(meta).get("spark-schema").asText())
      .asInstanceOf[StructType]

  /** Identity-transform partition columns of the default spec (bucket[N]
    * fields describe layout, not directory partitioning). */
  private def metaPartitionCols(meta: ObjectNode): Seq[String] = {
    val specId = meta.get("default-spec-id").asInt()
    meta.get("partition-specs").elements().asScala
      .find(_.get("spec-id").asInt() == specId)
      .map(_.get("fields").elements().asScala
        .filter(_.get("transform").asText() == "identity")
        .map(_.get("name").asText()).toSeq)
      .getOrElse(Seq.empty)
  }

  /** Live snapshot dirs of the current snapshot, oldest first, resolved
    * against the table's data dir. */
  private def liveSnapshots(meta: ObjectNode): Seq[String] = {
    val cur = meta.get("current-snapshot-id").asLong()
    meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == cur)
      .map(_.get("live").elements().asScala.map(_.asText()).toSeq)
      .getOrElse(Seq.empty)
  }

  private def newMeta(location: String, schema: StructType,
                      partitionBy: Seq[String],
                      bucket: Option[(Seq[String], Int)]): ObjectNode = {
    val meta = mapper.createObjectNode()
    meta.put("format-version", 2)
    meta.put("table-uuid", java.util.UUID.randomUUID().toString)
    meta.put("location", location)
    meta.put("last-sequence-number", 0L)
    meta.put("last-column-id", schema.fields.length)
    meta.put("current-schema-id", 0)
    meta.putArray("schemas").add(schemaNode(schema, 0))
    val fieldId = schema.fieldNames.zipWithIndex
      .map { case (n, i) => n -> (i + 1) }.toMap
    val spec = mapper.createObjectNode()
    spec.put("spec-id", 0)
    val specFields = spec.putArray("fields")
    val partFields: Seq[(String, String, Int)] = bucket match {
      case Some((cols, n)) =>
        cols.map(c => (s"${c}_bucket", s"bucket[$n]", fieldId(c)))
      case None =>
        partitionBy.map(c => (c, "identity", fieldId(c)))
    }
    partFields.zipWithIndex.foreach { case ((name, transform, srcId), i) =>
      val f = specFields.addObject()
      f.put("name", name)
      f.put("transform", transform)
      f.put("source-id", srcId)
      f.put("field-id", 1000 + i)
    }
    meta.putArray("partition-specs").add(spec)
    meta.put("default-spec-id", 0)
    meta.put("last-partition-id", 999 + partFields.length)
    val order = mapper.createObjectNode()
    order.put("order-id", 0)
    order.putArray("fields")
    meta.putArray("sort-orders").add(order)
    meta.put("default-sort-order-id", 0)
    meta.putObject("properties")
    bucket match {
      case Some((cols, n)) =>
        val b = meta.putObject("bucket-spec")
        val bc = b.putArray("columns"); cols.foreach(bc.add)
        b.put("num-buckets", n)
      case None => meta.putNull("bucket-spec")
    }
    meta.put("current-snapshot-id", -1L)
    meta.putArray("snapshots")
    meta.putArray("snapshot-log")
    meta.putArray("metadata-log")
    meta
  }

  /** Iceberg snapshot summary.operation vocabulary (append, replace,
    * overwrite, delete); our richer internal op names map onto it and are
    * kept verbatim in the sibling `operation` extension field. */
  private def summaryOperation(op: String): String = op match {
    case "append"    => "append"
    case "overwrite" => "overwrite"
    case "delete"    => "delete"
    case _           => "replace" // replace, rollback, compaction rewrites
  }

  /** Append a snapshot entry to `meta` and make it current. `live` is the
    * full live set AFTER this commit; it is emitted inline (the reader's
    * source of truth) AND as a JSON manifest-list file (the spec's
    * pointer-to-file shape, JSON standing in for Avro — see the divergence
    * note above). Runs inside the CAS loop: a lost race re-derives and
    * writes a fresh manifest-list file; the loser's file is tiny orphan
    * debt that [[expireSnapshots]]' manifest GC reclaims (any unreferenced
    * manifest-list whose sequence id is at or below the newest expired
    * snapshot's). */
  private def addSnapshot(ns: String, table: String, meta: ObjectNode,
                          operation: String, live: Seq[String]): ObjectNode = {
    val id = meta.get("last-sequence-number").asLong() + 1
    val parent = meta.get("current-snapshot-id").asLong()
    val now = System.currentTimeMillis()
    val manifests = mapper.createArrayNode()
    live.foreach { dir =>
      val m = manifests.addObject()
      m.put("manifest-path", dataDir(ns, table).resolve(dir).toString)
      m.put("content", "data")
    }
    val mlPath = manifestDir(ns, table)
      .resolve(s"manifest-list-$id-${java.util.UUID.randomUUID()}.json")
    Files.createDirectories(mlPath.getParent)
    Files.writeString(mlPath, manifests.toString)
    val snap = meta.get("snapshots").asInstanceOf[ArrayNode].addObject()
    snap.put("snapshot-id", id)
    if (parent >= 0) snap.put("parent-snapshot-id", parent)
    snap.put("sequence-number", id)
    snap.put("timestamp-ms", now)
    snap.put("manifest-list", mlPath.toString)
    snap.putObject("summary").put("operation", summaryOperation(operation))
    snap.put("schema-id", meta.get("current-schema-id").asInt())
    snap.put("operation", operation)
    val arr = snap.putArray("live"); live.foreach(arr.add)
    val logEntry = meta.get("snapshot-log").asInstanceOf[ArrayNode].addObject()
    logEntry.put("timestamp-ms", now)
    logEntry.put("snapshot-id", id)
    meta.put("last-sequence-number", id)
    meta.put("current-snapshot-id", id)
    meta
  }

  // ---- lifecycle -------------------------------------------------------

  override def ensureTable(ns: String, table: String, schema: StructType,
                           partitionBy: Seq[String]): Unit = {
    ensureNamespace(ns)
    commit(ns, table) {
      case None => Some(newMeta(dataDir(ns, table).getParent.toString,
        schema, partitionBy, None))
      case Some(meta) =>
        // creation race: the loser lands here against the winner's v1 and
        // re-runs as plain evolution — no second create ever published
        val existing = metaSchema(meta)
        val added =
          SchemaShape.diffForEvolution(existing, schema, s"$ns.$table")
        if (added.isEmpty) None
        else {
          // additive evolution, spec-style: APPEND a new schema object with
          // the next schema-id and point current-schema-id at it — history
          // keeps every schema; existing snapshots keep their layout,
          // load() aligns
          val widened = StructType(existing.fields ++ added)
          val nextId = meta.get("schemas").elements().asScala
            .map(_.get("schema-id").asInt()).max + 1
          meta.get("schemas").asInstanceOf[ArrayNode]
            .add(schemaNode(widened, nextId))
          meta.put("current-schema-id", nextId)
          meta.put("last-column-id", widened.fields.length)
          Some(meta)
        }
    }
  }

  private def writeSnapshot(ns: String, table: String, df: DataFrame,
                            partitionBy: Seq[String],
                            options: Map[String, String],
                            targetFiles: Option[Int] = None): String = {
    // nanoTime alone can collide across racing writers (same tick → same
    // directory → one writer's files silently replaced); the UUID makes
    // every snapshot directory unique regardless of timing
    val snapName = s"snap-${System.nanoTime()}-${java.util.UUID.randomUUID()}"
    val dir = dataDir(ns, table).resolve(snapName)
    val shaped = targetFiles match {
      case Some(n) if partitionBy.nonEmpty =>
        df.repartition(n, partitionBy.map(c => col(s"`$c`")): _*)
      case Some(n) => df.repartition(n)
      case None => df
    }
    val w = shaped.write.options(options).format("parquet").mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(dir.toString)
    snapName
  }

  override def append(ns: String, table: String, df: DataFrame,
                      options: Map[String, String]): Unit = {
    if (!tableExists(ns, table)) ensureTable(ns, table, df.schema)
    // data first (snapshot dirs are commit-agnostic), then the CAS loop:
    // a loser re-derives live = winner's live + its own dir, so racing
    // appends both land — neither snapshot is lost
    val snap = writeSnapshot(ns, table, df,
      metaPartitionCols(readMeta(ns, table)), options)
    commit(ns, table) { base =>
      val meta = base.getOrElse(throw new IllegalStateException(
        s"$ns.$table vanished mid-append"))
      Some(addSnapshot(ns, table, meta, "append",
        liveSnapshots(meta) :+ snap))
    }
  }

  override def overwrite(ns: String, table: String, df: DataFrame,
                         options: Map[String, String]): Unit = {
    if (!tableExists(ns, table)) ensureTable(ns, table, df.schema)
    val snap = writeSnapshot(ns, table, df,
      metaPartitionCols(readMeta(ns, table)), options)
    commit(ns, table) { base =>
      val meta = base.getOrElse(throw new IllegalStateException(
        s"$ns.$table vanished mid-overwrite"))
      Some(addSnapshot(ns, table, meta, "overwrite", Seq(snap)))
    }
  }

  /** Bucketed layout: rows are clustered into `numBuckets` hash buckets and
    * sorted within them, and the spec is recorded in the table metadata —
    * the data layout a bucket-join needs. Honest caveat (scaladoc'd, not
    * hidden): a PATH-based parquet read cannot convey the bucket spec to
    * Catalyst, so shuffle-free joins through THIS catalog's load() are not
    * elided by the optimizer; the layout is still cluster-correct, and a
    * real Iceberg catalog (or [[SessionLakeCatalog]]) exposes the same spec
    * to the planner. */
  override def writeBucketed(ns: String, table: String, df: DataFrame,
                             bucketCols: Seq[String], numBuckets: Int,
                             sortCols: Seq[String]): Unit = {
    ensureNamespace(ns)
    val clustered = df.repartition(numBuckets, bucketCols.map(col): _*)
    val sorted =
      if (sortCols.nonEmpty)
        clustered.sortWithinPartitions(sortCols.map(col): _*)
      else clustered
    val snap = writeSnapshot(ns, table, sorted, Nil, Map.empty)
    commit(ns, table)(_ => Some(addSnapshot(ns, table,
      newMeta(dataDir(ns, table).getParent.toString, df.schema, Nil,
        Some((bucketCols, numBuckets))),
      "overwrite", Seq(snap))))
  }

  override def load(ns: String, table: String): DataFrame =
    loadSnapshot(ns, table, None)

  /** Time travel (Iceberg `VERSION AS OF`): read the table as of any
    * snapshot in the log — snapshots are immutable directory sets, so a
    * historical read costs the same as a current one. Fails loudly on an
    * expired or unknown id. */
  def loadAt(ns: String, table: String, snapshotId: Long): DataFrame =
    loadSnapshot(ns, table, Some(snapshotId))

  /** Snapshot ids still present in the metadata log, oldest first. */
  /** Roll the table back to the state of `snapshotId` — as a NEW commit
    * (Iceberg rollback semantics: history is never rewritten; a fresh
    * snapshot is appended whose live set is the target's, so concurrent
    * writers CAS against it like any other commit, time travel still
    * reaches the abandoned states, and [[expireSnapshots]] reclaims them
    * on its usual schedule). Fails loudly on an unknown table or
    * snapshot id. */
  def rollbackTo(ns: String, table: String, snapshotId: Long): Unit =
    commit(ns, table) {
      case None =>
        throw new IllegalArgumentException(s"no such table: $ns.$table")
      case Some(meta) =>
        val snap = meta.get("snapshots").elements().asScala
          .find(_.get("snapshot-id").asLong() == snapshotId)
          .getOrElse(throw new IllegalArgumentException(
            s"no snapshot $snapshotId on $ns.$table"))
        val live = snap.get("live").elements().asScala.map(_.asText()).toSeq
        Some(addSnapshot(ns, table, meta, "rollback", live))
    }

  /** Row-level snapshot diff — the changelog read an Iceberg incremental
    * scan provides, composed from this catalog's own time travel: rows
    * visible at `toId` but not at `fromId` (added) and the reverse
    * (removed), as MULTISET differences so duplicate rows diff by count.
    * Both sides are lazy scans of the snapshots' live directories; the
    * anti-semantics run as distributed exceptAll, never a collect.
    * Consumers: incremental downstream syncs (ship `added` only),
    * overwrite audits (`removed` nonempty on an append-only table is an
    * alarm), and CDC-style replication without a log. */
  def snapshotDiff(ns: String, table: String, fromId: Long, toId: Long)
      : (DataFrame, DataFrame) = {
    val from = loadAt(ns, table, fromId)
    val to = loadAt(ns, table, toId)
    (to.exceptAll(from), from.exceptAll(to))
  }

  def snapshotIds(ns: String, table: String): Seq[Long] =
    readMeta(ns, table).get("snapshots").elements().asScala
      .map(_.get("snapshot-id").asLong()).toSeq

  // ---- row-level delete (Iceberg v2 copy-on-write) -----------------------

  /** Test seam: fired between the delete's rewrite and its commit attempt,
    * so the conflict-validation path (a concurrent commit rewriting a
    * touched dir) is deterministically exercisable. No-op in production. */
  protected def beforeDeleteCommit(ns: String, table: String): Unit = ()

  /** Iceberg v2 copy-on-write row-level DELETE: remove the rows where
    * `predicate` is TRUE (rows where it evaluates NULL are KEPT — SQL
    * DELETE semantics), rewriting ONLY the data directories that contain a
    * match and carrying every untouched directory into the new snapshot by
    * reference. Returns the number of rows deleted; deleting nothing
    * publishes NO snapshot.
    *
    * Cost shape: one locate scan over the live set (a real Iceberg writer
    * additionally prunes files by column min/max stats before this scan —
    * dir-level stats pruning is the same idea at this catalog's file-group
    * granularity), then a rewrite scan over ONLY the touched directories.
    * On a 100 TB table where a purge hits a handful of recent file groups,
    * the rewrite is proportional to the touched bytes, never the table.
    *
    * Isolation: the commit validates that every touched directory is still
    * live at publish time and fails loudly (serializable-style conflict)
    * if a concurrent compact/overwrite/delete rewrote one — a blind rebase
    * would resurrect rows the other commit removed. A racing APPEND rebases
    * cleanly (its directory is carried over untouched); rows it adds are
    * NOT covered by this delete — standard snapshot isolation, the delete
    * applies to the snapshot it read. */
  def deleteWhere(ns: String, table: String, predicate: Column): Long =
    deleteMatching(ns, table,
      df => df.filter(coalesce(predicate, lit(false))),
      df => df.filter(not(coalesce(predicate, lit(false)))))

  /** Key-set purge — [[deleteWhere]] for data-sized key sets (a predicate
    * cannot express "key IN <100M-row frame>"): removes every row whose
    * `keyCol` appears in `keys`, via semi/anti joins so the key set streams
    * through the shuffle (or broadcasts when small) instead of a driver
    * collect. The consumer shape: feed the dedup ledger's dropped doc_ids
    * (q129) or a right-to-be-forgotten list straight in. Idempotent by
    * construction: a replay matches nothing and publishes no snapshot. */
  def purgeKeys(ns: String, table: String, keyCol: String,
                keys: DataFrame): Long = {
    val ks = keys.select(col(keyCol)).distinct()
    deleteMatching(ns, table,
      df => df.join(ks, Seq(keyCol), "left_semi"),
      df => df.join(ks, Seq(keyCol), "left_anti"))
  }

  /** Shared copy-on-write core. `matched` selects the rows to delete,
    * `kept` their complement — the two faces above keep the pair
    * consistent (null-predicate rows fall on the KEPT side). */
  private def deleteMatching(ns: String, table: String,
                             matched: DataFrame => DataFrame,
                             kept: DataFrame => DataFrame): Long = {
    val meta = readMeta(ns, table)
    val schema = metaSchema(meta)
    val tag = "_graft_src_dir"
    require(!schema.fieldNames.contains(tag),
      s"$ns.$table has a column named $tag, which the delete rewrite reserves")
    val baseLive = liveSnapshots(meta)
    if (baseLive.isEmpty) return 0L
    // locate pass: ONE job over the live set, each dir's rows tagged with
    // their source dir; per-dir match counts are bounded by the dir count
    // (control plane), never row-shaped
    def tagged(dirs: Seq[String]): DataFrame = dirs
      .map(d => readAligned(ns, table, schema, Seq(d))
        .withColumn(tag, lit(d)))
      .reduce(_.unionByName(_))
    val perDir = matched(tagged(baseLive))
      .groupBy(tag).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val touched = baseLive.filter(d => perDir.getOrElse(d, 0L) > 0L)
    if (touched.isEmpty) return 0L
    val deleted = touched.map(perDir).sum
    // rewrite pass: only the touched dirs, in the current schema (an
    // Iceberg rewrite emits current-spec files), preserving the table's
    // partition layout
    val remainder = kept(tagged(touched)).drop(tag)
    // a rewrite that keeps nothing writes NO dir (a 0-row parquet dir in
    // the live set would poison the union read); the count scans only the
    // touched dirs, the same bytes the write is about to read
    val snapOpt =
      if (remainder.isEmpty) None
      else Some(writeSnapshot(ns, table, remainder,
        metaPartitionCols(meta), Map.empty))
    beforeDeleteCommit(ns, table)
    // The conflict throw below is a DESIGNED outcome — but the remainder
    // dir is already on disk, and a dir never referenced by any snapshot
    // is invisible to expireSnapshots (which derives reclaimable dirs from
    // metadata). Delete it before propagating so an aborted delete leaves
    // no permanent orphan.
    try {
      commit(ns, table) { base =>
        val cur = base.getOrElse(throw new IllegalStateException(
          s"$ns.$table vanished mid-delete"))
        val curLive = liveSnapshots(cur)
        val gone = touched.filterNot(curLive.contains)
        if (gone.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"delete on $ns.$table read ${gone.mkString(", ")} but a " +
              "concurrent commit rewrote or removed them — retry the delete " +
              "against the new snapshot")
        val newLive = curLive.filterNot(touched.contains) ++ snapOpt.toSeq
        Some(addSnapshot(ns, table, cur, "delete", newLive))
      }
    } catch {
      case e: Throwable =>
        snapOpt.foreach(sd => deleteTree(dataDir(ns, table).resolve(sd)))
        throw e
    }
    deleted
  }

  /** Atomic read-fold-replace ([[LakeCatalog.foldReplace]]): the commit
    * VALIDATES that the current snapshot is still the one the fold read —
    * an epoch appended between the read and the publish loses nothing,
    * because the stale rewrite is discarded (its never-referenced snapshot
    * directory deleted, no orphan debt) and the fold re-runs against the
    * winner. Bounded by [[MaxCommitRetries]] with a loud failure. */
  override def foldReplace(ns: String, table: String)
                          (fold: DataFrame => DataFrame): Unit = {
    var attempt = 0
    while (true) {
      val meta = readMeta(ns, table)
      val baseId = meta.get("current-snapshot-id").asLong()
      // fold reads the base snapshot's dirs; the rewrite lands in a FRESH
      // dir (snapshot isolation), so no checkpoint dance is needed — the
      // sources are never truncated under the reader
      val snap = writeSnapshot(ns, table, fold(load(ns, table)),
        metaPartitionCols(meta), Map.empty)
      var stale = false
      commit(ns, table) { base =>
        val cur = base.getOrElse(throw new IllegalStateException(
          s"$ns.$table vanished mid-foldReplace"))
        if (cur.get("current-snapshot-id").asLong() != baseId) {
          stale = true; None
        } else Some(addSnapshot(ns, table, cur, "overwrite", Seq(snap)))
      }
      if (!stale) return
      deleteTree(dataDir(ns, table).resolve(snap))
      attempt += 1
      if (attempt >= MaxCommitRetries)
        throw new IllegalStateException(
          s"foldReplace on $ns.$table lost to concurrent commits " +
            s"$MaxCommitRetries times")
    }
  }

  private def loadSnapshot(ns: String, table: String,
                           at: Option[Long]): DataFrame = {
    val meta = readMeta(ns, table)
    val schema = metaSchema(meta)
    val snaps = at match {
      case None => liveSnapshots(meta)
      case Some(id) =>
        val snap = meta.get("snapshots").elements().asScala
          .find(_.get("snapshot-id").asLong() == id)
          .getOrElse(throw new IllegalArgumentException(
            s"unknown or expired snapshot $id of $ns.$table " +
              s"(log has ${snapshotIds(ns, table).mkString(", ")})"))
        snap.get("live").elements().asScala.map(_.asText()).toSeq
    }
    readAligned(ns, table, schema, snaps)
  }

  /** Read a set of snapshot data dirs, each with ITS layout (basePath
    * recovers partition columns), aligned to `schema`: unionByName fills
    * columns a snapshot predates with NULL — Iceberg's read-time
    * evolution. Shared by [[load]]/[[loadAt]] and the copy-on-write delete
    * rewrite (which must rewrite old dirs in the CURRENT schema, as an
    * Iceberg rewrite does). */
  private def readAligned(ns: String, table: String, schema: StructType,
                          dirs: Seq[String]): DataFrame = {
    if (dirs.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val frames = dirs.map { s =>
      val dir = dataDir(ns, table).resolve(s).toString
      spark.read.option("basePath", dir).parquet(dir)
    }
    val unioned = frames.reduce(_.unionByName(_, allowMissingColumns = true))
    val withAll = schema.fieldNames.foldLeft(unioned) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(schema(c).dataType))
    }
    withAll.select(schema.fieldNames.toIndexedSeq.map(c => col(s"`$c`")): _*)
  }

  protected def deleteTree(dir: Path): Unit =
    if (Files.exists(dir)) {
      // Files.walk returns a Stream holding directory handles — close it
      // (materialize first; deletion happens outside the walk)
      scala.util.Using.resource(Files.walk(dir))(
        _.iterator().asScala.toSeq).reverse
        .foreach(Files.deleteIfExists(_))
    }

  /** Iceberg `expire_snapshots`: retain the `keepLast` most recent log
    * entries, then delete every snapshot directory referenced by NO
    * retained snapshot — the reclamation pass for the orphan debt
    * [[compact]] and [[overwrite]] accrue. Commit order is crash-safe:
    * the trimmed metadata publishes FIRST, so an interrupted expiry
    * leaves only unreferenced directories (orphans, re-collectable), never
    * a live snapshot with missing files. Time travel to an expired id
    * fails loudly ([[loadAt]]). */
  def expireSnapshots(ns: String, table: String, keepLast: Int = 1): Unit = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    var orphaned: Set[String] = Set.empty
    var maxDroppedId = -1L
    var keptManifests: Set[String] = Set.empty
    commit(ns, table) { base =>
      val meta = base.getOrElse(throw new IllegalStateException(
        s"$ns.$table does not exist"))
      val snaps = meta.get("snapshots").elements().asScala.toSeq
      if (snaps.size <= keepLast) {
        // reset ALL attempt state: a lost race (e.g. vs another expiry)
        // can land a retry here after an earlier attempt populated it
        orphaned = Set.empty; maxDroppedId = -1L; keptManifests = Set.empty
        None
      } else {
        val (drop, keep) = snaps.splitAt(snaps.size - keepLast)
        maxDroppedId = drop.map(_.get("snapshot-id").asLong()).max
        keptManifests = keep
          .flatMap(s => Option(s.get("manifest-list")).map(_.asText())).toSet
        def dirsOf(s: Seq[JsonNode]): Set[String] =
          s.flatMap(_.get("live").elements().asScala.map(_.asText())).toSet
        orphaned = dirsOf(drop) -- dirsOf(keep)
        val arr = mapper.createArrayNode()
        keep.foreach(arr.add)
        meta.set[JsonNode]("snapshots", arr)
        // keep snapshot-log consistent with the trimmed snapshot set (the
        // spec requires every log entry's id to resolve)
        val keptIds = keep.map(_.get("snapshot-id").asLong()).toSet
        val log = mapper.createArrayNode()
        Option(meta.get("snapshot-log")).foreach(_.elements().asScala
          .filter(e => keptIds.contains(e.get("snapshot-id").asLong()))
          .foreach(log.add))
        meta.set[JsonNode]("snapshot-log", log)
        Some(meta)
      }
    }
    orphaned.foreach(sd => deleteTree(dataDir(ns, table).resolve(sd)))
    // Manifest GC: every manifest-list file at or below the newest expired
    // sequence id that no kept snapshot references — the dropped snapshots'
    // own files AND the residue of CAS-race losers from older commits.
    // A concurrent in-flight append is never harmed: its file carries a
    // sequence id strictly above every dropped id (losers re-derive with a
    // fresh, higher id), so the id bound alone protects uncommitted files.
    if (maxDroppedId >= 0) {
      val md = manifestDir(ns, table)
      if (Files.exists(md))
        scala.util.Using.resource(Files.list(md))(_.iterator().asScala
          .filter(_.getFileName.toString.startsWith("manifest-list-"))
          .filter { p =>
            val id = p.getFileName.toString
              .stripPrefix("manifest-list-").takeWhile(_.isDigit)
            id.nonEmpty && id.toLong <= maxDroppedId &&
              !keptManifests.contains(p.toString)
          }
          .toSeq).foreach(Files.deleteIfExists(_))
    }
  }

  private def dirStats(ns: String, table: String,
                       dirName: String): (Long, Long) = {
    val p = dataDir(ns, table).resolve(dirName)
    if (!Files.exists(p)) (0L, 0L)
    else {
      val fs = scala.util.Using.resource(Files.walk(p))(
        _.iterator().asScala.filter(Files.isRegularFile(_)).toSeq)
      (fs.size.toLong, fs.map(Files.size).sum)
    }
  }

  private def liveDirsOf(sn: JsonNode): Seq[String] =
    sn.get("live").elements().asScala.map(_.asText()).toSeq

  /** Table maintenance report — the `snapshots` metadata table an Iceberg
    * operator reads before running maintenance: one row per retained
    * snapshot with its operation, referenced data directories/files/bytes,
    * whether it serves current reads, and whether
    * [[expireSnapshots]](keepLast) would drop it. Directory stats are
    * filesystem truth (a referenced dir missing on disk reads as 0 — the
    * corruption signal, not an exception). */
  def maintenanceReport(ns: String, table: String,
                        keepLast: Int = 1): DataFrame = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val meta = readMeta(ns, table)
    val cur = meta.get("current-snapshot-id").asLong()
    val snaps = meta.get("snapshots").elements().asScala.toSeq
    // one filesystem walk per DISTINCT directory — snapshots share dirs
    // heavily (every append references all its predecessors' dirs)
    val stats = snaps.flatMap(liveDirsOf).distinct
      .map(dn => dn -> dirStats(ns, table, dn)).toMap
    val rows = snaps.zipWithIndex.map { case (sn, i) =>
      val dirs = liveDirsOf(sn)
      val (nf, bytes) = dirs.map(stats)
        .foldLeft((0L, 0L)) { case ((f, b), (f2, b2)) => (f + f2, b + b2) }
      (sn.get("snapshot-id").asLong(), sn.get("operation").asText(),
        dirs.size.toLong, nf, bytes,
        sn.get("snapshot-id").asLong() == cur,
        i < snaps.size - keepLast)
    }
    spark.createDataFrame(rows).toDF("snapshot_id", "operation", "n_dirs",
      "n_files", "bytes", "is_current", "expirable")
  }

  /** One-row storage audit: snapshot count, bytes serving current reads,
    * bytes referenced by ANY retained snapshot, the bytes
    * [[expireSnapshots]](keepLast) would actually reclaim (exactly the
    * expiry set-difference math, so the number is a promise, spec-pinned
    * to the bytes freed), and the ORPHAN debt — directories on disk
    * referenced by no snapshot at all, the residue of interrupted
    * expiries/compactions that only a collector pass frees. */
  def storageAudit(ns: String, table: String, keepLast: Int = 1): DataFrame = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val meta = readMeta(ns, table)
    val snaps = meta.get("snapshots").elements().asScala.toSeq
    def dirsOf(s: Seq[JsonNode]): Set[String] = s.flatMap(liveDirsOf).toSet
    val all = dirsOf(snaps)
    val kept = dirsOf(snaps.takeRight(keepLast))
    val reclaim = all -- kept
    val current = liveSnapshots(meta).toSet
    val onDisk = {
      val root = dataDir(ns, table)
      if (!Files.exists(root)) Set.empty[String]
      else scala.util.Using.resource(Files.list(root))(_.iterator().asScala
        .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSet)
    }
    val orphans = onDisk -- all
    // one walk per distinct dir across all four overlapping sets
    val stats = (all ++ orphans).toSeq
      .map(dn => dn -> dirStats(ns, table, dn)._2).toMap
    def bytes(ds: Set[String]): Long = ds.toSeq.map(stats).sum
    spark.createDataFrame(Seq((snaps.size.toLong, bytes(current),
        bytes(all), bytes(reclaim), orphans.size.toLong, bytes(orphans))))
      .toDF("n_snapshots", "current_bytes", "retained_bytes",
        "reclaimable_bytes", "n_orphan_dirs", "orphan_bytes")
  }

  override def compact(ns: String, table: String, targetFiles: Int): Unit = {
    require(targetFiles > 0, s"targetFiles must be positive, got $targetFiles")
    val meta = readMeta(ns, table)
    require(meta.get("bucket-spec").isNull,
      s"$ns.$table is bucketed — compact() would drop its bucket spec; " +
        "rewrite via writeBucketed instead")
    val parts = metaPartitionCols(meta)
    // snapshot isolation makes the checkpoint dance unnecessary here: the
    // rewrite READS the old live dirs and WRITES a fresh snap dir — the
    // sources are never truncated under the reader (they just become
    // unreferenced, Iceberg's expire-snapshots debt)
    val snap = writeSnapshot(ns, table, load(ns, table), parts, Map.empty,
      targetFiles = Some(targetFiles))
    commit(ns, table) { base =>
      val cur = base.getOrElse(throw new IllegalStateException(
        s"$ns.$table vanished mid-compact"))
      Some(addSnapshot(ns, table, cur, "replace", Seq(snap)))
    }
  }
}
