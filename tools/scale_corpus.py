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

docs = pq.read_table(SRC / "documents.parquet").to_pylist()
# rotation by c % len(words) collides for docs shorter than COPIES words
# (copies c and c+len would be byte-identical under different doc_ids,
# injecting cross-copy exact-dup structure the source corpus lacks) —
# fail loudly instead of silently corrupting the stress corpus
short = sum(1 for r in docs if len(r["text"].split(" ")) < COPIES)
assert short == 0, (
    f"{short} docs have fewer than {COPIES} words — word rotation would "
    f"duplicate them verbatim across copies; lower COPIES or extend the "
    f"rotation scheme")
rows = []
for c in range(COPIES):
    for r in docs:
        words = r["text"].split(" ")
        rot = c % max(len(words), 1)
        text = " ".join(words[rot:] + words[:rot])
        rows.append({"doc_id": r["doc_id"] + c * KEY_OFFSET, "text": text,
                     "lang": r["lang"], "source": r["source"],
                     "n_chars": len(text)})
pq.write_table(pa.Table.from_pylist(rows), OUT / "documents.parquet")

emb = pq.read_table(SRC / "embeddings.parquet").to_pylist()
assert all(len(r["embedding"]) >= COPIES for r in emb), (
    "vector dim < COPIES: component rotation would repeat verbatim")
rows = []
for c in range(COPIES):
    for r in emb:
        v = r["embedding"]
        rot = c % max(len(v), 1)
        rows.append({"vec_id": r["vec_id"] + c * KEY_OFFSET,
                     "embedding": v[rot:] + v[:rot], "label": r["label"]})
schema = pa.schema([("vec_id", pa.int64()),
                    ("embedding", pa.list_(pa.float32())),
                    ("label", pa.int32())])
pq.write_table(pa.Table.from_pylist(rows, schema=schema),
               OUT / "embeddings.parquet")
print(f"wrote {OUT}: {len(docs) * COPIES} docs, {len(emb) * COPIES} vecs")
