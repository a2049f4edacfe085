# Offline tuning harness for the ANN/near-dup candidate-generation
# constants (dev-only; the Scala expressions are the implementation).
import duckdb, numpy as np, itertools, sys

M1 = 0x9E3779B97F4A7C15; M2 = 0xBF58476D1CE4E5B9; M3 = 0x94D049BB133111EB
MASK = (1 << 64) - 1
def splitmix64(x):
    z = (x + M1) & MASK
    z = ((z ^ (z >> 30)) * M2) & MASK
    z = ((z ^ (z >> 27)) * M3) & MASK
    return z ^ (z >> 31)

def load(sf):
    v = duckdb.sql(f"SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM '/root/testdata/{sf}/embeddings.parquet' ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in v]); X = np.array([r[1] for r in v])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    return ids, Xn

def true_pairs(Xn, tau):
    C = Xn @ Xn.T
    iu = np.triu_indices(len(Xn), 1)
    sel = C[iu] >= tau
    return set(zip(iu[0][sel].tolist(), iu[1][sel].tolist()))

def plane_signs(nplanes, dim):
    # exact replica of HyperplaneBits.signature's plane stream
    s = np.empty((nplanes, dim))
    for p in range(nplanes):
        for i in range(dim):
            s[p, i] = 1.0 if (splitmix64((p * 1000003 + i) & MASK) & 1) else -1.0
    return s

def lsh_bands(Xn, bits, bands):
    S = plane_signs(bits, Xn.shape[1])
    proj = Xn @ S.T  # n x bits
    bitsm = (proj > 0)
    w = bits // bands
    out = np.zeros((len(Xn), bands), dtype=np.int64)
    for b in range(bands):
        for j in range(w):
            out[:, b] |= bitsm[:, b * w + j].astype(np.int64) << j
    return out, w

def lsh_eval(Xn, truth, bits, bands, radius):
    B, w = lsh_bands(Xn, bits, bands)
    n = len(Xn)
    # pair candidate iff exists band with hamming(bucket_a, bucket_b) <= radius
    cand = np.zeros((n, n), dtype=bool)
    for b in range(bands):
        x = B[:, b]
        ham = np.zeros((n, n), dtype=np.int16)
        xor = x[:, None] ^ x[None, :]
        # popcount via unpackbits on the w low bits
        for j in range(w):
            ham += ((xor >> j) & 1).astype(np.int16)
        cand |= ham <= radius
    iu = np.triu_indices(n, 1)
    cands = set(zip(iu[0][cand[iu]].tolist(), iu[1][cand[iu]].tolist()))
    npairs = n * (n - 1) // 2
    rec = 1.0 if not truth else len(truth & cands) / len(truth)
    probes = 1 + (w if radius >= 1 else 0) + (w*(w-1)//2 if radius >= 2 else 0)
    return rec, len(cands) / npairs, len(cands), bands * probes

def ivf_eval(Xn, truth, nlist, massign, seed=7):
    rng = np.random.default_rng(seed)
    n = len(Xn)
    idx = rng.choice(n, nlist, replace=False)
    cents = Xn[idx]
    for _ in range(2):  # Lloyd
        a = np.argmax(Xn @ cents.T, axis=1)
        for c in range(nlist):
            m = Xn[a == c]
            if len(m): cents[c] = m.mean(0) / np.linalg.norm(m.mean(0))
    sim = Xn @ cents.T
    top = np.argsort(-sim, axis=1)[:, :massign]
    cand = np.zeros((n, n), dtype=bool)
    for c in range(nlist):
        members = np.where((top == c).any(1))[0]
        cand[np.ix_(members, members)] = True
    iu = np.triu_indices(n, 1)
    cands = set(zip(iu[0][cand[iu]].tolist(), iu[1][cand[iu]].tolist()))
    npairs = n * (n - 1) // 2
    rec = 1.0 if not truth else len(truth & cands) / len(truth)
    return rec, len(cands) / npairs, len(cands)

if __name__ == "__main__":
    for sf in ["sf0.001", "sf0.1"]:
        ids, Xn = load(sf)
        truth = true_pairs(Xn, 0.45)
        print(f"== {sf}: n={len(Xn)} true_pairs={len(truth)}")
        for bits, bands, r in [(64,16,0),(96,8,1),(128,8,1),(128,16,1),(192,16,1),(256,16,2),(128,16,2),(160,16,1),(192,12,1),(256,32,1)]:
            rec, ratio, nc, ent = lsh_eval(Xn, truth, bits, bands, r)
            print(f"  LSH bits={bits:3d} bands={bands:2d} w={bits//bands:2d} r={r}: recall={rec:.3f} cand_ratio={ratio:.4f} cands={nc} probes/row={ent}")
        for nlist, m in [(16,2),(32,2),(32,3),(64,3),(64,4),(128,4)]:
            rec, ratio, nc = ivf_eval(Xn, truth, nlist, m)
            print(f"  IVF nlist={nlist:3d} m={m}: recall={rec:.3f} cand_ratio={ratio:.4f} cands={nc}")

def cp_hashes(Xn, nhash, seed0=0, topt=1):
    """Cross-polytope: per hash, y = G x with deterministic Rademacher G
    (splitmix64 stream), outcome = argmax_i |y_i| signed; topt>1 returns
    the t best outcomes (multiprobe)."""
    n, d = Xn.shape
    out = np.zeros((n, nhash, topt), dtype=np.int64)
    for h in range(nhash):
        G = np.empty((d, d))
        for i in range(d):
            for j in range(d):
                G[i, j] = 1.0 if (splitmix64(((seed0 + h) * 4000037 + i * 64 + j) & MASK) & 1) else -1.0
        Y = Xn @ G.T
        order = np.argsort(-np.abs(Y), axis=1)[:, :topt]
        for t in range(topt):
            idx = order[:, t]
            sign = (Y[np.arange(n), idx] > 0).astype(np.int64)
            out[:, h, t] = 2 * idx + sign
    return out

def cp_eval(Xn, truth, k, L, topt):
    n = Xn.shape[0]
    H = cp_hashes(Xn, k * L, topt=topt)
    cand = np.zeros((n, n), dtype=bool)
    for b in range(L):
        # band value = tuple of k hash outcomes; base uses top-1, probe side any of topt combos
        base = H[:, b*k:(b+1)*k, 0]           # n x k
        bv = (base * (128 ** np.arange(k))).sum(1)
        # probe combos: cartesian of topt per hash
        import itertools as it
        for combo in it.product(range(topt), repeat=k):
            pv = np.zeros(n, dtype=np.int64)
            for ki, t in enumerate(combo):
                pv += H[:, b*k+ki, t] * (128 ** ki)
            m = bv[:, None] == pv[None, :]
            cand |= m | m.T
    iu = np.triu_indices(n, 1)
    cands = cand[iu].sum()
    rec = 1.0 if not truth else len(truth & set(zip(iu[0][cand[iu]].tolist(), iu[1][cand[iu]].tolist()))) / len(truth)
    return rec, cands / (n*(n-1)//2), int(cands)

if len(sys.argv) > 1 and sys.argv[1] == "cp":
    for sf in ["sf0.001", "sf0.1"]:
        ids, Xn = load(sf)
        truth = true_pairs(Xn, 0.45)
        print(f"== CP {sf}: n={len(Xn)} true={len(truth)}")
        for k, L, t in [(1,16,1),(1,32,1),(1,16,2),(1,32,2),(2,64,1),(2,64,2),(2,128,1),(2,96,2),(2,128,2)]:
            rec, ratio, nc = cp_eval(Xn, truth, k, L, t)
            print(f"  CP k={k} L={L:3d} topt={t}: recall={rec:.3f} cand_ratio={ratio:.4f} cands={nc} hashes={k*L}")

def topk_truth(Xn, nq, k):
    C = Xn[:nq] @ Xn.T
    np.fill_diagonal(C[:, :nq], -2)
    out = {}
    for q in range(nq):
        order = np.argsort(-C[q])
        out[q] = set(order[:k].tolist())
    return out

def cp_topk_eval(Xn, nq, k, kk, L, topt):
    n = Xn.shape[0]
    H = cp_hashes(Xn, kk * L, topt=topt)
    cand = np.zeros((nq, n), dtype=bool)
    import itertools as it
    for b in range(L):
        base = H[:, b*kk:(b+1)*kk, 0]
        bv = (base * (128 ** np.arange(kk))).sum(1)
        for combo in it.product(range(topt), repeat=kk):
            pv = np.zeros(n, dtype=np.int64)
            for ki, t in enumerate(combo):
                pv += H[:, b*kk+ki, t] * (128 ** ki)
            cand |= pv[:nq, None] == bv[None, :]
    truth = topk_truth(Xn, nq, k)
    hits = sum(len(truth[q] & set(np.where(cand[q])[0].tolist())) for q in range(nq))
    return hits / (nq * k), cand.sum() / (nq * n)

def ivf_topk_eval(Xn, nq, k, nlist, nprobe, seed):
    rng = np.random.default_rng(seed)
    n = Xn.shape[0]
    idx = rng.choice(n, nlist, replace=False)
    cents = Xn[idx]
    for _ in range(1):
        a = np.argmax(Xn @ cents.T, axis=1)
        for c in range(nlist):
            m = Xn[a == c]
            if len(m): cents[c] = m.mean(0) / np.linalg.norm(m.mean(0))
    sim = Xn @ cents.T
    assign = np.argmax(sim, axis=1)
    probes = np.argsort(-sim[:nq], axis=1)[:, :nprobe]
    cand = np.zeros((nq, n), dtype=bool)
    for q in range(nq):
        cand[q] = np.isin(assign, probes[q])
    truth = topk_truth(Xn, nq, k)
    hits = sum(len(truth[q] & set(np.where(cand[q])[0].tolist())) for q in range(nq))
    return hits / (nq * k), cand.sum() / (nq * n)

if len(sys.argv) > 1 and sys.argv[1] == "topk":
    for sf in ["sf0.001", "sf0.1"]:
        ids, Xn = load(sf)
        print(f"== topk {sf}: n={len(Xn)}")
        for kk, L, t in [(1,16,1),(1,32,1),(1,16,2),(1,24,2),(1,32,2),(2,64,2),(2,96,2)]:
            rec, frac = cp_topk_eval(Xn, 10, 3, kk, L, t)
            print(f"  CPtopk k={kk} L={L:3d} topt={t}: recall@3={rec:.3f} scan_frac={frac:.3f}")
        n = len(Xn)
        nlist = max(8, int(np.sqrt(n)))
        for nprobe in [2, 3, 4, 6]:
            recs = [ivf_topk_eval(Xn, 10, 3, nlist, nprobe, s)[0] for s in range(10)]
            fr = ivf_topk_eval(Xn, 10, 3, nlist, nprobe, 0)[1]
            print(f"  IVFtopk nlist={nlist} nprobe={nprobe}: recall min/med/max={min(recs):.2f}/{sorted(recs)[5]:.2f}/{max(recs):.2f} scan_frac={fr:.3f}")

if len(sys.argv) > 1 and sys.argv[1] == "ivf2":
    for sf in ["sf0.001", "sf0.1"]:
        ids, Xn = load(sf)
        n = len(Xn)
        nlist = max(8, int(np.sqrt(n)))
        print(f"== ivf2 {sf}: n={n} nlist={nlist}")
        for nprobe in [int(np.ceil(nlist*f)) for f in (0.25, 0.3, 0.35, 0.4, 0.5)]:
            recs = [ivf_topk_eval(Xn, 10, 3, nlist, nprobe, s)[0] for s in range(10)]
            fr = ivf_topk_eval(Xn, 10, 3, nlist, nprobe, 0)[1]
            print(f"  nprobe={nprobe:2d} ({nprobe/nlist:.2f}): recall min/med={min(recs):.2f}/{sorted(recs)[5]:.2f} scan={fr:.3f}")

if len(sys.argv) > 1 and sys.argv[1] == "skew":
    ids, Xn = load("sf0.1")
    n = len(Xn)
    H = cp_hashes(Xn, 2 * 128, topt=2)
    k, L, stride = 2, 128, 128
    from collections import Counter
    base = Counter(); probe = Counter()
    raw = 0
    for b in range(L):
        bc = Counter(); pc = Counter()
        for r in range(n):
            bk = H[r, b*2, 0] * 1 + H[r, b*2+1, 0] * 128
            bc[bk] += 1
            for t0 in range(2):
                for t1 in range(2):
                    pc[H[r, b*2, t0] + H[r, b*2+1, t1] * 128] += 1
        raw += sum(bc[key] * pc.get(key, 0) for key in bc)
        base.update(bc); probe.update(pc)
    print("raw join matches (incl self):", raw)
    print("hottest base buckets:", base.most_common(5))
    print("hottest probe buckets:", probe.most_common(5))
