#!/usr/bin/env bash
# Rich-fixture correctness gate (VERDICT r12 #2): run the full
# set-relation-sensitive tier — dedup thresholds, contamination,
# governance, overlap — against the DE-SATURATED fixture that
# `Profile rich-fixture` generates (SURVEY §17.10), not just the
# shipped sf fixtures whose 31-type vocabulary lets thresholded set
# queries pass degenerately.
#
# Two sub-tiers, split by ORACLE cost (the engine side handles both):
#  - MAIN (index-shaped oracle SQL): the full 50,000-doc fixture.
#  - QUAD (q39/q156 — their DuckDB oracles are brute-force all-pairs
#    list_intersect, ~1e12 list ops at 50k docs ≈ days single-node):
#    a deterministic 1-in-17 doc sample (~2,950 docs ≈ 4.3M oracle
#    pairs, minutes) of the SAME fixture — identical vocabulary
#    structure, so the de-saturation the gate exists to test is
#    preserved while the oracle stays computable.
#
# Usage: tools/rich_gate.sh [workDir]    (default /tmp/graft_rich_gate)
# Exit 0 iff every tier query hash-matches DuckDB on the rich fixture.
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/tmp/graft_rich_gate}"
RAW="$WORK/raw" FLAT="$WORK/flat" OUT="$WORK/out"
SAMP="$WORK/flat_sample" OUTS="$WORK/out_sample"
SRC_SF="/root/testdata/sf0.01"

TIER_MAIN="q56_contamination_check \
q76_domain_budget q89_mixture_weights q136_semantic_contamination \
q222_source_overlap q230_containment_topk q343_vocab_coverage_tiers \
q351_theta_audience_overlap q352_curriculum_phases q359_containment_dfcap \
q120_stream_static_dedup q144_stream_contamination q183_stream_dropdup \
q153_stream_interval_join q347_stream_interval_left \
q355_stream_interval_full"
# The six streaming entries are the r14 designed-truth additions
# (VERDICT r13 #6): the fixture plants dup_hist/dup_batch document
# slices, contaminated/sub-threshold docs, and five interval-join
# event slices (matched pair, provable singleton, late singleton,
# asymmetric-horizon singleton, anchor) in dedicated id/user ranges,
# so every state transition of the stream dedup and interval-join
# families fires at every scale. check_rich_fixture.py asserts the
# realized branch counts are non-degenerate.
TIER_QUAD="q30_dedup_minhash q39_ngram_jaccard q156_prefix_filter_jaccard"

mkdir -p "$FLAT"
if [ ! -d "$RAW/documents.parquet" ]; then
  sbt -batch "runMain graft.Profile rich-fixture $RAW"
fi
# flatten Spark's single-part output dirs to the flat files
# check_oracle.py registers, and symlink every other table from the
# shipped sf0.01 so queries touching embeddings/lineitem/... still run
for t in documents events; do
  # cp to a FILE target requires exactly one part; fail loudly if the
  # fixture writer ever stops coalescing to a single part (ADVICE r13)
  nparts=$(ls "$RAW/$t.parquet"/part-*.parquet | wc -l)
  if [ "$nparts" -ne 1 ]; then
    echo "rich_gate: expected 1 part file in $RAW/$t.parquet, got $nparts" >&2
    exit 1
  fi
  cp -f "$RAW/$t.parquet"/part-*.parquet "$FLAT/$t.parquet"
done
for t in region nation customer supplier part orders lineitem embeddings; do
  ln -sf "$SRC_SF/$t.parquet" "$FLAT/$t.parquet"
done
# The quad sub-tier's sampled documents: a deterministic 1-in-17
# slice PLUS planted near-dups — the rich fixture's per-doc token
# draws are unique, so without planting, every threshold-pair query
# hash-matches at 0 rows (degenerate both ways). A 1-in-51 sub-slice
# gets a copy with its FIRST TOKEN replaced: shingle jaccard
# (s-3)/(s+3) runs ~0.71 (20-token docs) to ~0.95 (120-token docs),
# so q30/q39 (t=0.6/0.5) match most planted pairs while q156 (t=0.8)
# matches only the longer ones — the thresholds DISCRIMINATE.
mkdir -p "$SAMP"
python3 - "$FLAT" "$SAMP" <<'EOF'
import sys, duckdb
flat, samp = sys.argv[1], sys.argv[2]
duckdb.sql(f"""COPY (
  WITH s AS (SELECT * FROM '{flat}/documents.parquet'
             WHERE doc_id % 17 = 0)
  SELECT doc_id, text, lang, source, n_chars FROM s
  UNION ALL
  SELECT doc_id + 1000000,
         'zq' || CAST(doc_id AS VARCHAR)
           || substr(text, strpos(text, ' ')) AS text,
         lang, source,
         CAST(length('zq' || CAST(doc_id AS VARCHAR)
           || substr(text, strpos(text, ' '))) AS INT) AS n_chars
  FROM s WHERE doc_id % 51 = 0
  ORDER BY 1
) TO '{samp}/documents.parquet' (FORMAT PARQUET)""")
EOF
for t in region nation customer supplier part orders lineitem embeddings; do
  ln -sf "$SRC_SF/$t.parquet" "$SAMP/$t.parquet"
done
ln -sf "$FLAT/events.parquet" "$SAMP/events.parquet"

[ -f "$OUT/oracle_sql.json" ] || \
  sbt -batch "runMain graft.Verify $FLAT $OUT $TIER_MAIN"
[ -f "$OUTS/oracle_sql.json" ] || \
  sbt -batch "runMain graft.Verify $SAMP $OUTS $TIER_QUAD"
python3 tools/check_oracle.py "$FLAT" "$OUT" $TIER_MAIN
python3 tools/check_oracle.py "$SAMP" "$OUTS" $TIER_QUAD
