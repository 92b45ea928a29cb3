#!/bin/bash
# Byte-exactness proof for the multimodal oracles (VERDICT r7 #4): build a
# corpus whose documents mix ASCII, Latin accents, CJK and emoji (1- to
# 4-byte UTF-8 sequences), then run the REAL Verify + DuckDB compare over
# it for every byte-sensitive multimodal query. A byte==codepoint
# assumption anywhere in the oracle SQL fails this check.
set -e
cd "$(dirname "$0")/.."
DIR=$(mktemp -d /tmp/graft-multibyte-XXXX)
python3 - "$DIR" <<'PY'
import sys, pandas as pd
d = sys.argv[1]
texts = [
    "plain ascii document with ordinary words only",
    "héllo wörld with àccénts éverywhere ünd ümlaut",
    "日本語のテキストです。これはマルチバイト文字列。",
    "mixed ascii with 中文 characters and ürk",
    "emoji soup 🎉🎊🚀 with four-byte sequences 🌍",
    "héllo wörld with àccénts éverywhere ünd ümlaut",  # exact dup (cluster)
    "कुछ देवनागरी पाठ भी यहाँ है",
]
rows = [(i, t, "xx", "s", len(t)) for i, t in enumerate(texts)]
pd.DataFrame(rows, columns=["doc_id","text","lang","source","n_chars"]) \
  .to_parquet(f"{d}/documents.parquet")
PY
# the compare tool creates views for every table: link the rest from sf0.001
for t in region nation customer supplier part orders lineitem events embeddings; do
  ln -s /root/testdata/sf0.001/$t.parquet "$DIR/$t.parquet"
done
SPARK_GRAFT_CPUS=8 /opt/spark/bin/spark-submit --driver-memory 8g \
  --class graft.Verify target/scala-2.13/targeticebergspark_2.13-0.1.0.jar \
  "$DIR" "$DIR/out" q34,q35,q50,q96,q127,q151 2>&1 | grep -i "failed:" || true
python3 tools/compare_oracle.py "$DIR" "$DIR/out" --skip-verify
