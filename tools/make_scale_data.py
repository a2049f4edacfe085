"""Generate the scale blowups used for the scale-evidence runs
(VERDICT r2 #7 at 10x, r7 #9 at 100x): FACTOR x embeddings (fresh
isotropic gaussians - the fixture's near-dup pairs match the natural
tail rate of iid vectors, so scaling the corpus scales the pair
population honestly) and FACTOR x documents (per-shard token renaming:
within-shard Jaccard preserved exactly, cross-shard similarity
destroyed). Prints exact ground truth for the embedding near-dup pair
count alongside.

Usage: make_scale_data.py [outdir] [factor] [noevents]
  factor 10  -> 20k embeddings / 50k docs / 1M events  (the r3 corpus)
  factor 100 -> 200k embeddings / 500k docs, events skipped unless asked
"""
import duckdb, numpy as np, pyarrow as pa, pyarrow.parquet as pq, os, sys

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
want_events = factor <= 10 and "noevents" not in sys.argv[3:]
os.makedirs(out, exist_ok=True)
rng = np.random.default_rng(20260812)

# embeddings: (2000 * factor) x 64 iid N(0,1) float32
n, d = 2000 * factor, 64
X = rng.standard_normal((n, d)).astype(np.float32)
pq.write_table(pa.table({"vec_id": pa.array(range(n), pa.int64()),
                         "embedding": pa.array(X.tolist(), pa.list_(pa.float32())),
                         "label": pa.array([0]*n, pa.int32())}),
               f"{out}/embeddings.parquet")
# exact truth at tau=0.45 (block matmul on normalized doubles; block
# rows sized so a 250 x n float64 block stays ~400MB at n=200k)
Xn = X.astype(np.float64); Xn /= np.linalg.norm(Xn, axis=1, keepdims=True)
pairs = 0
blk = max(50, min(2000, (4 * 10**8) // (8 * n)))
cols = np.arange(n)
for i0 in range(0, n, blk):
    C = Xn[i0:i0+blk] @ Xn.T
    upper = cols[None, :] > (i0 + np.arange(C.shape[0]))[:, None]
    pairs += int(((C >= 0.45) & upper).sum())
print(f"embeddings: n={n}, true near-dup pairs (cos>=0.45): {pairs}")

# documents: `factor` shards of sf0.1 with per-shard token suffix
docs = duckdb.sql("SELECT doc_id, text, lang, source, n_chars FROM '/root/testdata/sf0.1/documents.parquet' ORDER BY doc_id").fetchall()
ids, texts, langs, srcs, ncs = [], [], [], [], []
for s in range(factor):
    for (i, t, l, src, nc) in docs:
        ids.append(i + s * 1000000)
        texts.append(t if s == 0 else " ".join(w + f"~{s}" for w in t.split()))
        langs.append(l); srcs.append(src); ncs.append(nc)
pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts), "lang": pa.array(langs),
                         "source": pa.array(srcs),
                         "n_chars": pa.array(ncs, pa.int64())}),
               f"{out}/documents.parquet")
print(f"documents: {len(ids)} rows in {factor} token-renamed shards")

# events: `factor` user-shifted replicas of sf0.1 with jittered
# timestamps — per-user structure (sessions, funnels, transitions)
# preserved per replica, value distribution untouched, so the
# event-time tier scales both rows and key cardinality. Schema matches
# the pre-r7 harness fixture (nanosecond timestamps — the loaders are
# encoding-adaptive, see EventsEncodingSpec). Skipped at factor>10:
# the 100x probe targets the dedup/ANN tier.
if want_events:
    ev = duckdb.sql("SELECT event_id, epoch_ns(ts) AS ns, user_id, "
                    "event_type, value, props FROM "
                    "'/root/testdata/sf0.1/events.parquet' "
                    "ORDER BY event_id").fetchall()
    jit = rng.integers(0, 1_000_000, size=len(ev) * factor)  # < 1ms jitter
    eids, enss, eus, ets, evs, eps = [], [], [], [], [], []
    k = 0
    for s in range(factor):
        for (i, ns, u, t, v, p) in ev:
            eids.append(i + s * 10_000_000)
            enss.append(ns + int(jit[k])); k += 1
            eus.append(u + s * 100_000)
            ets.append(t); evs.append(v); eps.append(p)
    pq.write_table(pa.table({"event_id": pa.array(eids, pa.int64()),
                             "ts": pa.array(enss, pa.timestamp("ns")),
                             "user_id": pa.array(eus, pa.int64()),
                             "event_type": pa.array(ets),
                             "value": pa.array(evs, pa.float64()),
                             "props": pa.array(eps)}),
                   f"{out}/events.parquet")
    print(f"events: {len(eids)} rows, {len(set(eus))} users, {factor} replicas")
