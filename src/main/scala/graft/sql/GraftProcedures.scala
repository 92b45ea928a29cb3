package graft.sql

import graft.lake.SnapshotLakeCatalog
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** SQL `CALL` procedures — the maintenance lifecycle through the
  * statement operators actually run (`CALL graft.system.compact(...)`,
  * the role Iceberg's Spark procedures serve):
  *
  * {{{
  *   CALL graft.system.expire_snapshots(table => 'ns.t', keep_last => 3)
  *   CALL graft.system.expire_snapshots_older_than('ns.t', <epoch_ms>)
  *   CALL graft.system.rollback_to_snapshot('ns.t', <snapshot_id>)
  *   CALL graft.system.cherrypick_snapshot('ns.t', <snapshot_id>)
  *   CALL graft.system.fast_forward('ns.t', 'branch')
  *   CALL graft.system.compact('ns.t', <target_files>)
  *   CALL graft.system.remove_orphan_files('ns.t', <grace_ms>)
  * }}}
  *
  * Every procedure is a thin SQL face over an existing, spec-proven lake
  * face (`expireSnapshots`, `rollbackTo`, `cherrypickSnapshot`,
  * `fastForward`, `compact`, `removeOrphans`) — same commit semantics,
  * same loud-failure contracts. Each returns one summary row through a
  * [[LocalScan]] (driver-side control plane; the heavy work is the lake
  * face's own distributed jobs). */
object GraftProcedures {

  /** One procedure: fixed IN parameters, one-row result, driver thunk. */
  private final class Proc(
      val name0: String,
      params: Seq[(String, DataType)],
      out: StructType,
      run: InternalRow => InternalRow)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = name0
    override def description(): String = s"graft maintenance: $name0"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] =
      params.map { case (n, t) => ProcedureParameter.in(n, t).build() }
        .toArray
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val row = run(input)
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] = Array(row)
        override def readSchema(): StructType = out
      }
      java.util.List.of(scan).iterator()
    }
  }

  private def okSchema(extra: (String, DataType)*): StructType =
    StructType(StructField("table", StringType) +:
      extra.map { case (n, t) => StructField(n, t) })

  private def split(tbl: String): (String, String) = tbl.split('.') match {
    case Array(ns, t) => (ns, t)
    case _ => throw new IllegalArgumentException(
      s"table must be 'namespace.table', got '$tbl'")
  }

  def all(lake: SnapshotLakeCatalog): Map[String, UnboundProcedure] = {
    def tbl(in: InternalRow): (String, String, UTF8String) = {
      val raw = in.getUTF8String(0)
      require(raw != null, "table must not be null")
      val (ns, t) = split(raw.toString)
      (ns, t, raw)
    }
    def one(name: String, extraParams: Seq[(String, DataType)],
            extraOut: Seq[(String, DataType)] = Nil)(
        body: (String, String, InternalRow) => Seq[Any]): (String, UnboundProcedure) =
      name -> new Proc(name,
        ("table", StringType) +: extraParams,
        okSchema(extraOut: _*),
        in => {
          val (ns, t, raw) = tbl(in)
          InternalRow.fromSeq(raw +: body(ns, t, in))
        })

    Map(
      one("expire_snapshots", Seq("keep_last" -> IntegerType),
        Seq("retained" -> IntegerType)) { (ns, t, in) =>
        lake.expireSnapshots(ns, t, in.getInt(1))
        Seq(lake.snapshotIds(ns, t).length)
      },
      one("expire_snapshots_older_than",
        Seq("older_than_ms" -> LongType, "keep_last" -> IntegerType),
        Seq("retained" -> IntegerType)) { (ns, t, in) =>
        lake.expireSnapshotsOlderThan(ns, t, in.getLong(1), in.getInt(2))
        Seq(lake.snapshotIds(ns, t).length)
      },
      one("rollback_to_snapshot", Seq("snapshot_id" -> LongType),
        Seq("current_snapshot_id" -> LongType)) { (ns, t, in) =>
        lake.rollbackTo(ns, t, in.getLong(1))
        Seq(lake.snapshotIds(ns, t).last)
      },
      one("cherrypick_snapshot", Seq("snapshot_id" -> LongType),
        Seq("current_snapshot_id" -> LongType)) { (ns, t, in) =>
        lake.cherrypickSnapshot(ns, t, in.getLong(1))
        Seq(lake.snapshotIds(ns, t).last)
      },
      one("fast_forward", Seq("branch" -> StringType),
        Seq("current_snapshot_id" -> LongType)) { (ns, t, in) =>
        lake.fastForward(ns, t, in.getUTF8String(1).toString)
        Seq(lake.snapshotIds(ns, t).last)
      },
      one("compact", Seq("target_files" -> IntegerType),
        Seq("live_files" -> IntegerType)) { (ns, t, in) =>
        lake.compact(ns, t, in.getInt(1))
        Seq(lake.load(ns, t).inputFiles.length)
      },
      one("remove_orphan_files", Seq("grace_ms" -> LongType),
        Seq("removed_dirs" -> LongType, "bytes_freed" -> LongType)) {
        (ns, t, in) =>
          val rep = lake.removeOrphans(ns, t, in.getLong(1)).collect()(0)
          Seq(rep.getAs[Long]("n_removed_dirs"),
            rep.getAs[Long]("bytes_freed"))
      },
      // ref management — with the branch_/tag_ identifier tables these
      // close the WAP loop in pure SQL: INSERT INTO t.branch_x stages,
      // create_tag pins an audited snapshot, fast_forward publishes,
      // drop_ref abandons
      one("create_tag", Seq("name" -> StringType,
          "snapshot_id" -> LongType),
        Seq("snapshot_id" -> LongType)) { (ns, t, in) =>
        lake.tag(ns, t, in.getUTF8String(1).toString, in.getLong(2))
        Seq(in.getLong(2))
      },
      one("drop_ref", Seq("name" -> StringType),
        Seq("remaining_refs" -> IntegerType)) { (ns, t, in) =>
        lake.dropRef(ns, t, in.getUTF8String(1).toString)
        Seq(lake.listRefs(ns, t).size)
      })
  }

  def load(lake: SnapshotLakeCatalog, ident: Identifier): UnboundProcedure = {
    if (ident.namespace().toSeq != Seq("system"))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident.toString, ident.toString)
    all(lake).getOrElse(ident.name(),
      throw new IllegalArgumentException(
        s"unknown procedure '${ident.name()}' — known: " +
          all(lake).keys.toSeq.sorted.mkString(", ")))
  }

  def list(lake: SnapshotLakeCatalog,
           namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.toSeq == Seq("system"))
      all(lake).keys.toSeq.sorted
        .map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty
}
