#!/usr/bin/env python3
"""Clean-room EXTERNAL reader for graft's Iceberg-v2-layout tables.

Reads a table exactly the way a third-party Iceberg engine would — from the
spec file formats alone:

  metadata/v<N>.metadata.json  ->  current snapshot  ->  manifest-list
  (Avro)  ->  per-directory manifests (Avro)  ->  parquet data + delete
  files, with v2 sequence-number inheritance, (file_path, pos) position
  deletes, and sequence-scoped equality deletes.

ZERO code is shared with the Scala library: the Avro container/binary
decoder below is written from the public Avro 1.11 spec, parquet reading
and the delete-application relational algebra run in DuckDB. No Iceberg
engine (pyiceberg / duckdb-iceberg / iceberg-spark-runtime) exists in this
offline environment, so this independent spec implementation is the
external-read gate: it must reproduce the library's own load() output
(dumped by graft.InteropDump) exactly, row for row.

Usage: iceberg_external_read.py <outRoot>   # as written by InteropDump
         (expects <outRoot>/warehouse/interop/* and <outRoot>/expected/*)
"""
import json
import os
import struct
import sys
import zlib

import duckdb

# ---------------------------------------------------------------- Avro ----
# Container + binary decoder per the public Avro spec: magic Obj\x01, file
# metadata map (avro.schema JSON, avro.codec), 16-byte sync marker, then
# blocks of <count, byte-size, payload, sync>. Scalars: zigzag varints for
# int/long, little-endian IEEE for float/double, length-prefixed UTF-8 /
# bytes; complex: records = fields in order, unions = branch index + value,
# arrays/maps = repeated blocks terminated by count 0 (negative count =
# |count| items preceded by a byte size).


class _Cursor:
    def __init__(self, buf):
        self.buf = buf
        self.pos = 0

    def take(self, n):
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise EOFError("truncated Avro data")
        self.pos += n
        return b

    def vlong(self):
        shift, acc = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        return (acc >> 1) ^ -(acc & 1)

    def read(self, sch):
        if isinstance(sch, list):  # union: branch index, then its value
            return self.read(sch[self.vlong()])
        t = sch if isinstance(sch, str) else sch["type"]
        if t == "null":
            return None
        if t == "boolean":
            return self.take(1)[0] != 0
        if t in ("int", "long"):
            return self.vlong()
        if t == "float":
            return struct.unpack("<f", self.take(4))[0]
        if t == "double":
            return struct.unpack("<d", self.take(8))[0]
        if t == "bytes":
            return self.take(self.vlong())
        if t == "string":
            return self.take(self.vlong()).decode("utf-8")
        if t == "fixed":
            return self.take(sch["size"])
        if t == "enum":
            return sch["symbols"][self.vlong()]
        if t == "record":
            return {f["name"]: self.read(f["type"]) for f in sch["fields"]}
        if t in ("array", "map"):
            out = [] if t == "array" else {}
            while True:
                n = self.vlong()
                if n == 0:
                    break
                if n < 0:
                    self.vlong()  # byte size of the block — skip
                    n = -n
                for _ in range(n):
                    if t == "array":
                        out.append(self.read(sch["items"]))
                    else:
                        k = self.take(self.vlong()).decode("utf-8")
                        out[k] = self.read(sch["values"])
            return out
        raise ValueError(f"unsupported Avro type: {t}")


def read_avro(path):
    """All records of an Avro container file, as dicts. Returns
    (writer_schema, records)."""
    buf = open(path, "rb").read()
    cur = _Cursor(buf)
    if cur.take(4) != b"Obj\x01":
        raise ValueError(f"{path}: not an Avro container file")
    meta = cur.read({"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = cur.take(16)
    records = []
    while cur.pos < len(buf):
        count = cur.vlong()
        size = cur.vlong()
        payload = cur.take(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec}")
        block = _Cursor(payload)
        for _ in range(count):
            records.append(block.read(schema))
        if cur.take(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, records


# ------------------------------------------------------------- metadata ----

ICEBERG_TO_DUCK = {
    "long": "BIGINT", "int": "INTEGER", "string": "VARCHAR",
    "double": "DOUBLE", "float": "FLOAT", "boolean": "BOOLEAN",
    "date": "DATE", "timestamp": "TIMESTAMP", "timestamptz": "TIMESTAMPTZ",
}


def duck_type(iceberg_type):
    """DuckDB SQL type for an Iceberg primitive, or None (pass-through).
    decimal(P,S) maps structurally — the cast is what widens PRE-PROMOTION
    files (int under a long column, decimal(8,2) under (16,2)) to the
    current schema, the reader-side half of Iceberg type promotion."""
    if iceberg_type in ICEBERG_TO_DUCK:
        return ICEBERG_TO_DUCK[iceberg_type]
    if iceberg_type.startswith("decimal("):
        return "DECIMAL" + iceberg_type[len("decimal"):]
    return None


def rename_history(meta):
    """current column name -> its FORMER names (oldest first), from the
    metadata's schemas list: field ids are positional in this layout, so
    position i's name trail across schema objects is field i+1's rename
    history — exactly how an Iceberg reader maps an old file's physical
    column onto the current schema without rewriting data."""
    schemas = sorted(meta["schemas"], key=lambda s: s["schema-id"])
    cur = next(s for s in schemas
               if s["schema-id"] == meta["current-schema-id"])
    hist = {}
    for i, f in enumerate(cur["fields"]):
        olds = []
        for s in schemas:
            if i < len(s["fields"]):
                n = s["fields"][i]["name"]
                if n != f["name"] and n not in olds:
                    olds.append(n)
        if olds:
            hist[f["name"]] = olds
    return hist


def current_metadata(table_dir):
    """Latest vN.metadata.json, by the HadoopCatalog upward probe."""
    md = os.path.join(table_dir, "metadata")
    versions = [int(f[1:-len(".metadata.json")])
                for f in os.listdir(md)
                if f.startswith("v") and f.endswith(".metadata.json")
                and f[1:-len(".metadata.json")].isdigit()]
    if not versions:
        raise ValueError(f"{table_dir}: no metadata versions")
    with open(os.path.join(md, f"v{max(versions)}.metadata.json")) as fh:
        meta = json.load(fh)
    # metadata-log field-shape validation (spec: prior metadata files for
    # metadata time travel): every entry must carry timestamp-ms and a
    # metadata-file that exists and parses as a metadata document
    for e in meta.get("metadata-log", []):
        if "timestamp-ms" not in e or "metadata-file" not in e:
            raise ValueError(f"{table_dir}: malformed metadata-log entry {e}")
        if not os.path.exists(e["metadata-file"]):
            raise ValueError(
                f"{table_dir}: metadata-log names a missing file "
                f"{e['metadata-file']}")
        with open(e["metadata-file"]) as fh:
            prior = json.load(fh)
        if "schemas" not in prior:
            raise ValueError(
                f"{table_dir}: logged prior metadata is not a metadata "
                f"document: {e['metadata-file']}")
    return meta


def plan_scan(meta, snapshot_id=None):
    """Iceberg scan planning from the spec files: walk the chosen (default
    current) snapshot's manifest list, apply v2 inheritance, and split
    entries into data files, position-delete files and equality-delete
    files (each with its data sequence number)."""
    cur = snapshot_id if snapshot_id is not None \
        else meta["current-snapshot-id"]
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == cur)
    _, ml = read_avro(snap["manifest-list"])
    data_files, pos_files, eq_files = [], [], []
    for m in ml:
        seq = m["sequence_number"]  # inherited by the manifest's entries
        _, entries = read_avro(m["manifest_path"])
        for e in entries:
            df = e["data_file"]
            own = e.get("sequence_number")
            eseq = own if own is not None else seq
            if df["content"] == 0:
                data_files.append((df["file_path"], eseq))
            elif df["content"] == 1:
                pos_files.append((df["file_path"], eseq))
            elif df["content"] == 2:
                eq_files.append((df["file_path"], eseq,
                                 df["equality_ids"] or []))
    return data_files, pos_files, eq_files


def table_columns(meta):
    """(name, iceberg_type, field_id) of the current schema, in order."""
    sid = meta["current-schema-id"]
    schema = next(s for s in meta["schemas"] if s["schema-id"] == sid)
    return [(f["name"], f["type"], f["id"]) for f in schema["fields"]]


# ------------------------------------------------------------ read table ----


def read_table(con, table_dir, snapshot_id=None):
    """The table's rows (current, or as of `snapshot_id`) as a DuckDB
    relation SQL string, deletes applied — the external reader's
    equivalent of load() / loadAt()."""
    meta = current_metadata(table_dir)
    cols = table_columns(meta)
    data_files, pos_files, eq_files = plan_scan(meta, snapshot_id)
    if not data_files:
        empty = ", ".join(
            f'NULL::{duck_type(t) or "VARCHAR"} AS "{n}"'
            for n, t, _ in cols)
        return f"SELECT {empty} WHERE false"

    files_sql = ", ".join(f"('{p}', {s})" for p, s in data_files)
    con.execute(f"""CREATE OR REPLACE TEMP TABLE _seq(path VARCHAR,
                    seq BIGINT); INSERT INTO _seq VALUES {files_sql}""")
    # hive_partitioning recovers identity-partition columns from the path;
    # union_by_name null-fills columns older files predate (read-time
    # schema evolution); filename + file_row_number feed position deletes.
    # Files are grouped by their PARTITION-KEY SET first: a spec-evolved
    # or partition-source-renamed table mixes directory layouts
    # (`lang=..` dirs beside `language=..` dirs beside unpartitioned),
    # and DuckDB's hive inference requires consistent keys per scan — so
    # each layout generation scans separately and the generations UNION
    # BY NAME, exactly how an Iceberg reader plans per-spec manifests.
    def hive_keys(path):
        return tuple(sorted(seg.split("=", 1)[0]
                            for seg in path.split("/") if "=" in seg))
    groups = {}
    for p, _ in data_files:
        groups.setdefault(hive_keys(p), []).append(p)
    selects = []
    for paths in groups.values():
        plist = "[" + ", ".join(f"'{p}'" for p in paths) + "]"
        selects.append(f"""SELECT * FROM read_parquet({plist},
            union_by_name=true, hive_partitioning=true, filename=true,
            file_row_number=true)""")
    union = " UNION ALL BY NAME ".join(f"({s})" for s in selects)
    con.execute(f"""
        CREATE OR REPLACE TEMP VIEW _scan0 AS
        SELECT d.*, s.seq AS _seq
        FROM ({union}) d
        JOIN _seq s ON d.filename = s.path""")
    # RENAME mapping (schema history): a pre-rename file's physical column
    # appears under its old name with NULLs from newer files — fold each
    # current column with its former names (most recent first), so every
    # row reads under the current name
    present = {r[0] for r in con.execute("DESCRIBE _scan0").fetchall()}
    hist = rename_history(meta)
    folded = []
    for n, t, _ in cols:
        sources = [c for c in [n] + list(reversed(hist.get(n, [])))
                   if c in present]
        if not sources:
            continue  # absent everywhere: the null-fill below covers it
        if len(sources) == 1 and sources[0] == n:
            folded.append(f'"{n}"')
        else:
            folded.append("COALESCE(" +
                          ", ".join(f'"{c}"' for c in sources) +
                          f') AS "{n}"')
    extra = [c for c in ("filename", "file_row_number", "_seq")
             if c in present]
    con.execute("CREATE OR REPLACE TEMP VIEW _scan AS SELECT " +
                ", ".join(folded + [f'"{c}"' for c in extra]) +
                " FROM _scan0")

    masks = []
    if pos_files:
        pp = "[" + ", ".join(f"'{p}'" for p, _ in pos_files) + "]"
        # delete rows carry the writer's scan URI (file:///...); manifests
        # and DuckDB's filename carry the plain path — normalize the scheme
        masks.append(f"""NOT EXISTS (SELECT 1 FROM read_parquet({pp}) p
            WHERE regexp_replace(p.file_path, '^file:/+', '/') =
                  _scan.filename AND p.pos = _scan.file_row_number)""")
    by_id = {fid: name for name, _, fid in cols}
    for path, seq, eq_ids in eq_files:
        # equality_ids are FIELD IDS (rename-proof): they resolve to the
        # CURRENT column names; the delete FILE's physical columns are the
        # purge-time names, so map each key through the rename history to
        # whatever name the file actually carries
        keys = [by_id[i] for i in eq_ids]
        efile_cols = {r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{path}')").fetchall()}
        def src_of(k):
            for c in [k] + list(reversed(hist.get(k, []))):
                if c in efile_cols:
                    return c
            return k
        on = " AND ".join(f'e."{src_of(k)}" = _scan."{k}"' for k in keys)
        # the spec's scoping rule: an equality delete masks only data files
        # with a STRICTLY LOWER data sequence number — a key re-appended
        # after the purge survives it
        masks.append(f"""NOT EXISTS (SELECT 1 FROM read_parquet('{path}') e
            WHERE {on} AND _scan._seq < {seq})""")
    where = ("WHERE " + " AND ".join(masks)) if masks else ""
    sel = ", ".join(
        f'"{n}"::{duck_type(t)} AS "{n}"' if duck_type(t)
        else f'"{n}"' for n, t, _ in cols
        if n in present or n in hist)
    # columns absent from EVERY file (added after all writes): null-fill
    missing = ", ".join(
        f'NULL::{duck_type(t) or "VARCHAR"} AS "{n}"'
        for n, t, _ in cols
        if n not in present and n not in hist)
    sel = ", ".join(x for x in (sel, missing) if x)
    return f"SELECT {sel} FROM _scan {where}"


def compare(con, table_dir, expected_dir, ref=None):
    meta = current_metadata(table_dir)
    cols = table_columns(meta)
    snapshot_id = meta["refs"][ref]["snapshot-id"] if ref else None
    ext_sql = read_table(con, table_dir, snapshot_id)
    sel = ", ".join(
        f'"{n}"::{duck_type(t)} AS "{n}"' if duck_type(t)
        else f'"{n}"' for n, t, _ in cols)
    ext = con.execute(
        f"SELECT * FROM ({ext_sql}) ORDER BY ALL").fetchall()
    exp = con.execute(
        f"""SELECT {sel} FROM read_parquet('{expected_dir}/*.parquet')
            ORDER BY ALL""").fetchall()
    name = os.path.basename(table_dir) + (f"@{ref}" if ref else "")
    if len(ext) != len(exp):
        print(f"FAIL {name}: external {len(ext)} rows, load() {len(exp)}")
        return False
    for i, (a, b) in enumerate(zip(ext, exp)):
        if a != b:
            print(f"FAIL {name}: row {i} differs\n  external: {a}\n"
                  f"  load():   {b}")
            return False
    print(f"PASS {name} ({len(ext)} rows, byte-identical to load())")
    return True


def main():
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/interop"
    wh = os.path.join(out_root, "warehouse", "interop")
    ok = True
    tables = sorted(os.listdir(wh))
    for t in tables:
        ok &= compare(duckdb.connect(), os.path.join(wh, t),
                      os.path.join(out_root, "expected", t))
    # <table>@<ref> expected dirs: resolve the named ref from the metadata
    # `refs` map and read the table AS OF that snapshot (tag time travel)
    refs = [d for d in sorted(os.listdir(os.path.join(out_root, "expected")))
            if "@" in d]
    for d in refs:
        tbl, ref = d.split("@", 1)
        ok &= compare(duckdb.connect(), os.path.join(wh, tbl),
                      os.path.join(out_root, "expected", d), ref=ref)
    print(f"\n{'ALL PASS' if ok else 'FAILURES'} "
          f"({len(tables)} tables + {len(refs)} ref reads)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
