"""Generalized multipass treelet sim at BLOCK=1024 (matches TRAV_ROWS=8).

Variants:
  mp d<D> P<K>      — re-sort before each pass by (next-subtree, key); next =
                      argmin slab-enter among eligible (entered & unvisited)
  mp1sort d<D>      — ONE sort by (s1, s2, key) computed up front; pass 1
                      walks s1 per block, pass 2 walks s2 (eligibility still
                      re-checked against live best_t); cleanup from root
All exact (cleanup pass bounds by best_t); counts pops + leaf visits.
"""
import sys
sys.path.insert(0, "/root/repo/experiments")
import numpy as np
import sim_traversal as st

st.LEAF_SIZE = 16
st.BLOCK = 1024
BLOCK = st.BLOCK
quad, slots, tree_np = st.build(16)
root_lo, root_hi = tree_np[0, 0:3], tree_np[0, 3:6]
N = 32768
o, d = st.rays(N, "incoherent")
nb = N // BLOCK
key = st.make_key("oct_m4", o, d, root_lo, root_hi)
iv_g = 1.0 / np.where(np.abs(d) > 1e-12, d, 1e-12)


def collect(depth):
    roots = [(0, 0)]
    cut, shallow = [], []
    while roots:
        node, dep = roots.pop()
        if dep == depth:
            rec = quad[node]
            blo = np.minimum.reduce([rec[6*c:6*c+3] for c in range(4)])
            bhi = np.maximum.reduce([rec[6*c+3:6*c+6] for c in range(4)])
            cut.append((node, blo, bhi))
            continue
        rec = quad[node]
        for c in range(4):
            meta = rec[24 + c]
            box = (rec[6*c:6*c+3].copy(), rec[6*c+3:6*c+6].copy())
            if meta >= 0.0:
                shallow.append((int(meta), box))
            else:
                roots.append((int(-meta) - 1, dep + 1))
    return sorted(cut), shallow


def enter_t(blo, bhi, o_s, iv, far):
    a = (blo[None] - o_s) * iv
    b = (bhi[None] - o_s) * iv
    t0 = np.minimum(a, b); t1 = np.maximum(a, b)
    ent = np.maximum(t0.max(axis=1), st.T_MIN)
    ext = np.minimum(t1.min(axis=1), far)
    return np.where(ent <= ext, ent, np.inf)


def prologue(shallow, o_s, d_s, iv, best_t, best_i):
    tl = 0
    for slot_base, (blo, bhi) in shallow:
        bh = st.slab(blo, bhi, o_s, iv, best_t)
        if bh.any():
            tl += (len(o_s) + BLOCK - 1) // BLOCK
            best_t, best_i = st.leaf_visit(slots, slot_base, o_s, d_s, bh,
                                           best_t, best_i)
    return tl, best_t, best_i


def run_mp(depth, n_passes, one_sort=False):
    cut, shallow = collect(depth)
    K = len(cut)
    best_t = np.full(N, st.T_MAX, np.float32)
    best_i = np.full(N, -1.0, np.float32)
    tp_, tl, n_blk = 0, 0, 0
    tl0, best_t, best_i = prologue(shallow, o, d, iv_g, best_t, best_i)
    tl += tl0
    visited = np.zeros((N, K), bool)

    def nxt_of(order=0):
        ents = np.stack([
            np.where(visited[:, j], np.inf,
                     enter_t(blo, bhi, o, iv_g, best_t))
            for j, (node, blo, bhi) in enumerate(cut)
        ], axis=1)  # (N, K)
        srt = np.argsort(ents, axis=1, kind="stable")
        pick = srt[:, order]
        ok = np.take_along_axis(ents, pick[:, None], 1)[:, 0] < np.inf
        return np.where(ok, pick, K)

    if one_sort:
        s1 = nxt_of(0)
        s2 = nxt_of(1)
        skey = ((s1.astype(np.int64) * (K + 1) + s2) << 40) | key
        sidx = np.argsort(skey, kind="stable")
        phases = [s1, s2][:n_passes]
    else:
        phases = None

    for p in range(n_passes):
        if one_sort:
            sel_next = phases[p]
        else:
            sel_next = nxt_of(0)
            if (sel_next >= K).all():
                break
            sidx = np.argsort(((sel_next.astype(np.int64)) << 40) | key,
                              kind="stable")
        for b0 in range(0, N, BLOCK):
            part = sidx[b0:b0 + BLOCK]
            bc = int(sel_next[part[0]])
            if bc >= K:
                continue
            node, blo, bhi = cut[bc]
            # live eligibility re-check (esp. for the stale one-sort s2)
            ent = enter_t(blo, bhi, o[part], iv_g[part], best_t[part])
            act = (sel_next[part] == bc) & ~visited[part, bc] & (ent < np.inf)
            if not act.any():
                continue
            bt_in = np.where(act, best_t[part], -1.0).astype(np.float32)
            pp, ll, bt, bi = st.walk_block(
                quad, slots, o[part], d[part], root=node,
                best_t=bt_in, best_i=best_i[part].copy())
            tp_ += pp; tl += ll; n_blk += 1
            best_t[part] = np.where(act, bt, best_t[part])
            best_i[part] = np.where(act, bi, best_i[part])
            visited[part, bc] |= act

    nxt = nxt_of(0)
    active = nxt < K
    if active.any():
        sidx = np.argsort(((~active).astype(np.int64) << 40) | key, kind="stable")
        for b0 in range(0, N, BLOCK):
            part = sidx[b0:b0 + BLOCK]
            act = active[part]
            if not act.any():
                continue
            bt_in = np.where(act, best_t[part], -1.0).astype(np.float32)
            pp, ll, bt, bi = st.walk_block(
                quad, slots, o[part], d[part], root=0,
                best_t=bt_in, best_i=best_i[part].copy())
            tp_ += pp; tl += ll; n_blk += 1
            best_t[part] = np.where(act, bt, best_t[part])
            best_i[part] = np.where(act, bi, best_i[part])
    return tp_, tl, n_blk, best_t


sub = st.primary_subtree(quad, o, d, 1)
p0, l0, ref_bt = st.run_variant(quad, slots, o, d, (sub << 15) | key)
print(f"sub1 @1024   : pops={p0:6d} leafs={l0:6d} blocks/walk={nb}", flush=True)
for depth in (1, 2):
    for P in (1, 2, 3):
        p, l, k, bt = run_mp(depth, P)
        ok = np.allclose(bt, ref_bt, rtol=1e-5, atol=1e-5)
        print(f"mp d{depth} P{P}      : pops={p:6d} leafs={l:6d} blocks={k} "
              f"sorts={P+1} match={ok}", flush=True)
    p, l, k, bt = run_mp(depth, 2, one_sort=True)
    ok = np.allclose(bt, ref_bt, rtol=1e-5, atol=1e-5)
    print(f"mp1sort d{depth}   : pops={p:6d} leafs={l:6d} blocks={k} "
          f"sorts=2 match={ok}", flush=True)
