#!/usr/bin/env python3
"""Build the 10x stress corpus used by the sf1 runs recorded in BASELINE.md.

Replicates documents/embeddings COPIES times with key offsets (doc_id/vec_id
stay globally unique — the corpus contract q108/q109 enforce loudly), word-
rotating each document copy and component-rotating each embedding copy so
text/vectors are DISTINCT across copies while lengths, distributions and the
intra-copy near-dup structure match the original. All other tables are copied
unchanged (the scale-sensitive operator families read only documents and
embeddings). n_chars is recomputed from the rotated text so the column stays
consistent with the payload.

Usage: python3 tools/scale_corpus.py <srcSfDir> <outDir> [copies=10]
"""
import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path(sys.argv[1])
OUT = Path(sys.argv[2])
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
KEY_OFFSET = 1_000_000  # > any base doc_id/vec_id at every driver SF

OUT.mkdir(parents=True, exist_ok=True)

for f in SRC.glob("*.parquet"):
    if f.stem not in ("documents", "embeddings"):
        shutil.copy(f, OUT / f.name)

from hashlib import md5

docs = pq.read_table(SRC / "documents.parquet").to_pylist()
# Rotation capacity: word rotation alone collides past len(words) copies
# (copies c and c+len would be byte-identical under different doc_ids,
# injecting cross-copy exact-dup structure the source corpus lacks). The
# second LAP (c >= len(words), needed for 100x) adds a length-preserving
# character rotation of the whole text — first-lap output is identical to
# the original scheme, so existing 10x corpora and their recorded ratios
# are unaffected. Distinctness is ASSERTED per source doc after the fact
# (a pathological periodic text would fail loudly, never corrupt).
rows = []
seen_docs = {}
for c in range(COPIES):
    for r in docs:
        words = r["text"].split(" ")
        rot = c % max(len(words), 1)
        lap = c // max(len(words), 1)
        text = " ".join(words[rot:] + words[:rot])
        if lap > 0 and len(text) > 1:
            k = lap % len(text)
            text = text[k:] + text[:k]
        rows.append({"doc_id": r["doc_id"] + c * KEY_OFFSET, "text": text,
                     "lang": r["lang"], "source": r["source"],
                     "n_chars": len(text)})
        seen_docs.setdefault(r["doc_id"], set()).add(
            md5(text.encode()).hexdigest())
bad = {k: len(v) for k, v in seen_docs.items() if len(v) != COPIES}
assert not bad, (
    f"rotation produced colliding copies for {len(bad)} docs (periodic "
    f"text?): {dict(list(bad.items())[:3])}")
pq.write_table(pa.Table.from_pylist(rows), OUT / "documents.parquet")

emb = pq.read_table(SRC / "embeddings.parquet").to_pylist()
# same two-level scheme for vectors: component rotation (first lap, the
# original scheme) then reversal on odd laps — norm- and distribution-
# preserving, capacity 2*dim >= 100 at dim 64; distinctness asserted
rows = []
seen_vecs = {}
for c in range(COPIES):
    for r in emb:
        v = r["embedding"]
        rot = c % max(len(v), 1)
        lap = c // max(len(v), 1)
        v2 = v[rot:] + v[:rot]
        if lap % 2 == 1:
            v2 = v2[::-1]
        rows.append({"vec_id": r["vec_id"] + c * KEY_OFFSET,
                     "embedding": v2, "label": r["label"]})
        seen_vecs.setdefault(r["vec_id"], set()).add(
            md5(repr(v2).encode()).hexdigest())
assert COPIES <= 2 * min(len(r["embedding"]) for r in emb), (
    "copies exceed 2*dim: extend the vector rotation scheme")
badv = {k: len(v) for k, v in seen_vecs.items() if len(v) != COPIES}
assert not badv, (
    f"vector rotation produced colliding copies for {len(badv)} vecs: "
    f"{dict(list(badv.items())[:3])}")
schema = pa.schema([("vec_id", pa.int64()),
                    ("embedding", pa.list_(pa.float32())),
                    ("label", pa.int32())])
pq.write_table(pa.Table.from_pylist(rows, schema=schema),
               OUT / "embeddings.parquet")
print(f"wrote {OUT}: {len(docs) * COPIES} docs, {len(emb) * COPIES} vecs")
