"""Host-side (numpy) simulator of the block-synchronous BVH4 walk.

Replays the exact kernel algorithm (same quad blob, same near-first push
order, same per-lane ``far = best_t`` bounding) over the measure_bvh6 ray
sets and counts the two cost drivers — node pops and leaf-child visits —
so sort-key schemes and treelet binning can be swept WITHOUT the TPU.

Counts, not nanoseconds: a variant that cuts pops+leafs ~2x is the one
worth building.  Calibration anchor: the current scheme (octant<<12 |
morton4) measured 8.12 ms / 131072 incoherent rays on v5e (16.1 Mrays/s,
/tmp/bvh6.log round 3).

Usage: python experiments/sim_traversal.py [--rays 32768]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from path_tracing__ray_tracer_tpu.ops import bvh as bvh_mod
from path_tracing__ray_tracer_tpu.ops.pallas.bvh_pallas import (
    _NODE4_F,
    _SLOT_F,
    pack_blobs,
    pack_blobs4,
)
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)

BLOCK = 4096  # TRAV_ROWS * LANES
T_MIN, T_MAX = 1e-3, 1e6
LEAF_SIZE = 16  # set from --leaf-size in main()


def build(leaf_size=16):
    b = MeshSceneBuilder()
    scene = b.build_scene()
    tris = [o for o in scene.objects if type(o).__name__ == "Triangle"]
    v0 = np.array([[t.v0.x, t.v0.y, t.v0.z] for t in tris], np.float32)
    v1 = np.array([[t.v1.x, t.v1.y, t.v1.z] for t in tris], np.float32)
    v2 = np.array([[t.v2.x, t.v2.y, t.v2.z] for t in tris], np.float32)
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    arrs = bvh_mod.build_bvh(tri_min, tri_max, leaf_size=leaf_size,
                             use_native=False)
    tree_np, slot_np, _depth = pack_blobs(arrs, v0, v1, v2)
    quad_np, _depth4 = pack_blobs4(arrs)
    quad = quad_np.reshape(-1, _NODE4_F)
    slots = slot_np.reshape(-1, _SLOT_F)
    return quad, slots, tree_np


def rays(n, kind):
    rng = np.random.default_rng(1)
    if kind == "incoherent":
        centers = np.array([[dx * 9.0, dy * 9.0, 0.0]
                            for dx in (-1, 0, 1) for dy in (-1, 0, 1)], np.float32)
        ci = rng.integers(0, 9, n)
        nrm = rng.normal(size=(n, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        o = centers[ci] + nrm * 3.0
        u1, u2 = rng.random(n, np.float32), rng.random(n, np.float32)
        r = np.sqrt(u1)
        phi = 2 * np.pi * u2
        a = np.where(np.abs(nrm[:, 2:3]) < 0.9, [[0, 0, 1]], [[1, 0, 0]]).astype(np.float32)
        t1 = np.cross(nrm, a)
        t1 /= np.linalg.norm(t1, axis=1, keepdims=True)
        t2 = np.cross(nrm, t1)
        d = (t1 * (r * np.cos(phi))[:, None] + t2 * (r * np.sin(phi))[:, None]
             + nrm * np.sqrt(1 - u1)[:, None]).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        return o, d
    raise ValueError(kind)


def slab(box_lo, box_hi, o, iv, far):
    a = (box_lo[None] - o) * iv
    b = (box_hi[None] - o) * iv
    t0 = np.minimum(a, b)
    t1 = np.maximum(a, b)
    enter = np.maximum(t0.max(axis=1), T_MIN)
    exit_ = np.minimum(t1.min(axis=1), far)
    return enter <= exit_


def leaf_visit(slots, base, o, d, box_hit, best_t, best_i):
    """``base`` is a slot-row index (leaf_index * leaf_size), as stored in
    the node metas."""
    rec = slots[base : base + LEAF_SIZE]
    for k in range(rec.shape[0]):
        v0r, e1, e2, gid = rec[k, 0:3], rec[k, 3:6], rec[k, 6:9], rec[k, 9]
        h = np.cross(d, e2[None])
        det = (e1[None] * h).sum(axis=1)
        ok = np.abs(det) > 1e-6
        inv = 1.0 / np.where(ok, det, 1.0)
        s = o - v0r[None]
        u = inv * (s * h).sum(axis=1)
        q = np.cross(s, e1[None])
        v = inv * (d * q).sum(axis=1)
        t = inv * (e2[None] * q).sum(axis=1)
        win = (ok & (gid >= 0) & (u >= 0) & (u <= 1) & (v >= 0)
               & (u + v <= 1) & (t > T_MIN) & box_hit & (t < best_t))
        best_t = np.where(win, t, best_t)
        best_i = np.where(win, gid, best_i)
    return best_t, best_i


def walk_block(quad, slots, o, d, root=0, best_t=None, best_i=None):
    """Exact replay of _bvh4_closest_kernel over one block; returns
    (pops, leaf_visits, best_t, best_i)."""
    n = o.shape[0]
    iv = 1.0 / np.where(np.abs(d) > 1e-12, d, 1e-12)
    if best_t is None:
        best_t = np.full(n, T_MAX, np.float32)
        best_i = np.full(n, -1.0, np.float32)
    pg = (np.where(d > 0, 1.0, -1.0).sum(axis=0) >= 0.0)  # (3,)
    stack = [root]
    pops = leafs = 0
    while stack:
        node = stack.pop()
        pops += 1
        rec = quad[node]
        hits, anyc = [], []
        for c in range(4):
            bh = slab(rec[6 * c : 6 * c + 3], rec[6 * c + 3 : 6 * c + 6],
                      o, iv, best_t)
            hits.append(bh)
            anyc.append(bh.any())
        metas = rec[24:28]
        for c in range(4):
            if anyc[c] and metas[c] >= 0.0:
                leafs += 1
                best_t, best_i = leaf_visit(
                    slots, int(metas[c]), o, d, hits[c], best_t, best_i)
        # near-first ordering from split codes (mirror _quad_push_order)
        def near_first(k):
            axis, flip = int(k) % 4, (int(k) // 4) > 0
            return bool(pg[axis]) != flip

        p0n = near_first(rec[28])
        c0n = near_first(rec[29])
        c2n = near_first(rec[30])
        pair0 = [0, 1] if c0n else [1, 0]          # near, far within pair0
        pair1 = [2, 3] if c2n else [3, 2]
        order = pair0 + pair1 if p0n else pair1 + pair0  # near pair first
        for c in reversed(order):                   # push far first
            if anyc[c] and metas[c] < 0.0:
                stack.append(int(-metas[c]) - 1)
    return pops, leafs, best_t, best_i


def morton(o, root_lo, root_hi, bits):
    scale = (2.0**bits - 1e-3) / np.maximum(root_hi - root_lo, 1e-30)
    cell = np.clip((o - root_lo[None]) * scale[None], 0, 2.0**bits - 1).astype(np.int64)
    out = np.zeros(o.shape[0], np.int64)
    for b in range(bits):
        for ax, sh in ((0, 2), (1, 1), (2, 0)):
            out |= ((cell[:, ax] >> b) & 1) << (3 * b + sh)
    return out


def make_key(scheme, o, d, root_lo, root_hi):
    if scheme.startswith("oct_m"):  # octant-major, morton B bits
        B = int(scheme[5:])
        oc = ((d[:, 0] > 0).astype(np.int64) << 2) | ((d[:, 1] > 0).astype(np.int64) << 1) | (d[:, 2] > 0)
        return (oc << (3 * B)) | morton(o, root_lo, root_hi, B)
    if scheme.startswith("m_oct"):  # morton-major
        B = int(scheme[5:])
        oc = ((d[:, 0] > 0).astype(np.int64) << 2) | ((d[:, 1] > 0).astype(np.int64) << 1) | (d[:, 2] > 0)
        return (morton(o, root_lo, root_hi, B) << 3) | oc
    if scheme.startswith("dq_m"):  # 2-bit/axis direction quantization major
        B = int(scheme[4:])
        dq = np.zeros(d.shape[0], np.int64)
        for ax in range(3):
            q = np.digitize(d[:, ax], [-0.5, 0.0, 0.5])  # 0..3
            dq = (dq << 2) | q
        return (dq << (3 * B)) | morton(o, root_lo, root_hi, B)
    raise ValueError(scheme)


def primary_subtree(quad, o, d, depth):
    """Per-ray id (0..4^depth-1) of the first depth-``depth`` subtree the ray
    enters, visiting children in the ray's own near-first order; rays that
    enter nothing get the max id.  On TPU this is a handful of vectorized
    slab tests + selects — no gathers."""
    n = o.shape[0]
    iv = 1.0 / np.where(np.abs(d) > 1e-12, d, 1e-12)
    best = np.full(n, 4 ** depth, np.int64)
    rank = np.zeros(n, np.int64)

    def near_order(rec):
        # per-ray near-first child order via split codes (vectorized):
        # returns (n, 4) array of child columns in visit order
        def nf(k):
            axis, flip = int(k) % 4, (int(k) // 4) > 0
            pos = d[:, axis] > 0
            return pos != flip

        p0n, c0n, c2n = nf(rec[28]), nf(rec[29]), nf(rec[30])
        pair0 = np.where(c0n[:, None], [[0, 1]], [[1, 0]])
        pair1 = np.where(c2n[:, None], [[2, 3]], [[3, 2]])
        return np.where(p0n[:, None], np.concatenate([pair0, pair1], 1),
                        np.concatenate([pair1, pair0], 1))

    def first_child(rec, active):
        """Per-ray first child (by the ray's near order) whose box is hit;
        -1 if none."""
        order = near_order(rec)
        hitm = np.stack([
            slab(rec[6 * c:6 * c + 3], rec[6 * c + 3:6 * c + 6],
                 o, iv, np.full(n, T_MAX, np.float32))
            for c in range(4)
        ], axis=1)
        chosen = np.full(n, -1, np.int64)
        lanes = np.arange(n)
        for pos in range(4):
            c = order[:, pos]
            h = hitm[lanes, c]
            take = active & (chosen < 0) & h
            chosen[take] = c[take]
        return chosen

    del rank
    c0 = first_child(quad[0], np.ones(n, bool))
    if depth == 1:
        return np.where(c0 < 0, 4, c0)
    for c in range(4):
        sel = c0 == c
        if not sel.any():
            continue
        meta = quad[0][24 + c]
        if meta >= 0.0:
            best[sel] = c * 4
        else:
            c1 = first_child(quad[int(-meta) - 1], sel)
            best[sel] = c * 4 + np.maximum(c1[sel], 0)
    best[c0 < 0] = 4 ** depth
    return best


def run_variant(quad, slots, o, d, key):
    idx = np.argsort(key, kind="stable")
    o_s, d_s = o[idx], d[idx]
    tot_p = tot_l = 0
    bt_all = np.empty(o.shape[0], np.float32)
    for b0 in range(0, o.shape[0], BLOCK):
        p, l, bt, _bi = walk_block(quad, slots, o_s[b0:b0 + BLOCK], d_s[b0:b0 + BLOCK])
        tot_p += p
        tot_l += l
        bt_all[b0:b0 + BLOCK] = bt
    un = np.empty_like(bt_all)
    un[idx] = bt_all
    return tot_p, tot_l, un


def run_treelet(quad, slots, o, d, key, depth):
    """Phase-per-subtree: compact rays entering each depth-``depth`` BVH4
    subtree (with their current best_t as the slab bound), walk only that
    subtree.  Leaf children encountered above the cut are visited in a
    prologue walk of the top levels."""
    n = o.shape[0]
    iv = 1.0 / np.where(np.abs(d) > 1e-12, d, 1e-12)
    best_t = np.full(n, T_MAX, np.float32)
    best_i = np.full(n, -1.0, np.float32)
    tot_p = tot_l = n_blocks = 0

    # collect subtree roots at the cut plus shallow leaf slots
    roots = [(0, 0)]
    cut_roots, shallow_leaves = [], []  # (node), (slot_base, parent,childbox)
    while roots:
        node, dep = roots.pop()
        if dep == depth:
            cut_roots.append(node)
            continue
        rec = quad[node]
        for c in range(4):
            meta = rec[24 + c]
            box = (rec[6 * c:6 * c + 3].copy(), rec[6 * c + 3:6 * c + 6].copy())
            if meta >= 0.0:
                shallow_leaves.append((int(meta), box))
            else:
                roots.append((int(-meta) - 1, dep + 1))

    # prologue: shallow leaves tested for all rays (cheap, few of them)
    for slot_base, (blo, bhi) in shallow_leaves:
        bh = slab(blo, bhi, o, iv, best_t)
        if bh.any():
            tot_l += (n + BLOCK - 1) // BLOCK
            best_t, best_i = leaf_visit(slots, slot_base, o, d, bh, best_t, best_i)

    # phases: fixed global order = node index (SAH layout is roughly spatial)
    for root in sorted(cut_roots):
        rec = quad[root]
        blo = np.minimum.reduce([rec[6 * c:6 * c + 3] for c in range(4)])
        bhi = np.maximum.reduce([rec[6 * c + 3:6 * c + 6] for c in range(4)])
        enter = slab(blo, bhi, o, iv, best_t)
        sel = np.where(enter)[0]
        if sel.size == 0:
            continue
        # sort selected rays by the coherence key, walk in blocks
        sidx = sel[np.argsort(key[sel], kind="stable")]
        for b0 in range(0, sidx.size, BLOCK):
            part = sidx[b0:b0 + BLOCK]
            p, l, bt, bi = walk_block(
                quad, slots, o[part], d[part], root=root,
                best_t=best_t[part].copy(), best_i=best_i[part].copy())
            tot_p += p
            tot_l += l
            n_blocks += 1
            best_t[part] = bt
            best_i[part] = bi
    return tot_p, tot_l, n_blocks, best_t


def child_rank(quad, d, node_rec):
    """(n, 4) per-ray visit rank of one BVH4 node's children (mirrors
    _quad_push_order near-first logic; vectorized over rays)."""
    def nf(k):
        axis, flip = int(k) % 4, (int(k) // 4) > 0
        return (d[:, axis] > 0) != flip

    p0n, c0n, c2n = nf(node_rec[28]), nf(node_rec[29]), nf(node_rec[30])
    pair0 = np.where(p0n, 0, 2)
    pair1 = np.where(p0n, 2, 0)
    return np.stack([
        pair0 + np.where(c0n, 0, 1),
        pair0 + np.where(c0n, 1, 0),
        pair1 + np.where(c2n, 0, 1),
        pair1 + np.where(c2n, 1, 0),
    ], axis=1)


def run_multipass(quad, slots, o, d, key, n_passes):
    """The buildable TPU scheme: P sorted passes, each walking ONE depth-1
    subtree per block (block root = first lane's choice; straddle lanes
    masked), best_t carried, then a cleanup pass from the global root for
    lanes with any entered-but-unvisited subtree left.  Exact by
    construction (cleanup bounds by best_t).  Returns pops, leafs, blocks,
    best_t."""
    n = o.shape[0]
    iv = 1.0 / np.where(np.abs(d) > 1e-12, d, 1e-12)
    best_t = np.full(n, T_MAX, np.float32)
    best_i = np.full(n, -1.0, np.float32)
    tot_p = tot_l = n_blocks = 0

    root_rec = quad[0]
    ranks = child_rank(quad, d, root_rec)  # (n, 4)
    cut_root = [None] * 4
    for c in range(4):
        meta = root_rec[24 + c]
        if meta >= 0.0:  # shallow leaf: prologue visit for all rays
            bh = slab(root_rec[6 * c:6 * c + 3], root_rec[6 * c + 3:6 * c + 6],
                      o, iv, best_t)
            if bh.any():
                tot_l += (n + BLOCK - 1) // BLOCK
                best_t, best_i = leaf_visit(slots, int(meta), o, d, bh,
                                            best_t, best_i)
        else:
            cut_root[c] = int(-meta) - 1

    visited = np.zeros((n, 4), bool)
    for c in range(4):
        if cut_root[c] is None:
            visited[:, c] = True

    def next_subtree():
        """Per-ray min-rank eligible (entered & unvisited) child, else 4."""
        nxt = np.full(n, 4, np.int64)
        best_rank = np.full(n, 8, np.int64)
        for c in range(4):
            if cut_root[c] is None:
                continue
            bh = slab(root_rec[6 * c:6 * c + 3], root_rec[6 * c + 3:6 * c + 6],
                      o, iv, best_t)
            elig = bh & ~visited[:, c]
            r = np.where(elig, ranks[:, c], 8)
            take = r < best_rank
            best_rank = np.where(take, r, best_rank)
            nxt = np.where(take, c, nxt)
        return nxt

    for _p in range(n_passes):
        nxt = next_subtree()
        if (nxt >= 4).all():
            break
        sidx = np.argsort((nxt << 40) | key, kind="stable")
        for b0 in range(0, n, BLOCK):
            part = sidx[b0:b0 + BLOCK]
            block_c = int(nxt[part[0]])
            if block_c >= 4:
                continue  # fully inactive block (sorted tail)
            walked = nxt[part] == block_c
            bt_in = np.where(walked, best_t[part], -1.0).astype(np.float32)
            p, l, bt, bi = walk_block(
                quad, slots, o[part], d[part], root=cut_root[block_c],
                best_t=bt_in, best_i=best_i[part].copy())
            tot_p += p
            tot_l += l
            n_blocks += 1
            best_t[part] = np.where(walked, bt, best_t[part])
            best_i[part] = np.where(walked, bi, best_i[part])
            visited[part, block_c] |= walked

    # cleanup: anything entered-but-unvisited walks from the global root
    nxt = next_subtree()
    active = nxt < 4
    if active.any():
        sidx = np.argsort((~active).astype(np.int64) << 40 | key, kind="stable")
        for b0 in range(0, n, BLOCK):
            part = sidx[b0:b0 + BLOCK]
            act = active[part]
            if not act.any():
                continue
            bt_in = np.where(act, best_t[part], -1.0).astype(np.float32)
            p, l, bt, bi = walk_block(quad, slots, o[part], d[part], root=0,
                                      best_t=bt_in, best_i=best_i[part].copy())
            tot_p += p
            tot_l += l
            n_blocks += 1
            best_t[part] = np.where(act, bt, best_t[part])
            best_i[part] = np.where(act, bi, best_i[part])
    return tot_p, tot_l, n_blocks, best_t


def main():
    global LEAF_SIZE
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=32768)
    ap.add_argument("--leaf-size", type=int, default=16)
    ap.add_argument("--keys-only", action="store_true")
    ap.add_argument("--multipass-only", action="store_true")
    args = ap.parse_args()
    LEAF_SIZE = args.leaf_size

    quad, slots, tree_np = build(args.leaf_size)
    root_lo = tree_np[0, 0:3]
    root_hi = tree_np[0, 3:6]
    o, d = rays(args.rays, "incoherent")
    nb = args.rays // BLOCK
    print(f"rays={args.rays} blocks={nb} quad_nodes={quad.shape[0]}")

    if args.multipass_only:
        key = make_key("oct_m4", o, d, root_lo, root_hi)
        sub = primary_subtree(quad, o, d, 1)
        skey = (sub << 15) | key
        p0, l0, ref_bt = run_variant(quad, slots, o, d, skey)
        print(f"sub1_oct_m4   : pops={p0:6d} leafs={l0:6d} "
              f"per-block p={p0/nb:7.1f} l={l0/nb:6.1f}", flush=True)
        for npass in (1, 2, 3):
            p, l, k, bt = run_multipass(quad, slots, o, d, key, npass)
            ok = np.allclose(bt, ref_bt, rtol=1e-5, atol=1e-5)
            print(f"multipass P={npass}: pops={p:6d} leafs={l:6d} "
                  f"blocks={k} (vs {nb}/pass) match={ok}", flush=True)
        return

    ref_bt = None
    schemes = ("oct_m4",) if args.keys_only else (
        "oct_m4", "oct_m2", "oct_m3", "oct_m5", "oct_m6",
        "m_oct4", "dq_m3", "dq_m4")
    for scheme in schemes:
        key = make_key(scheme, o, d, root_lo, root_hi)
        p, l, bt = run_variant(quad, slots, o, d, key)
        if ref_bt is None:
            ref_bt = bt
        ok = np.allclose(bt, ref_bt, rtol=1e-5, atol=1e-5)
        print(f"{scheme:8s}: pops={p:6d} leafs={l:6d} "
              f"per-block p={p/nb:7.1f} l={l/nb:6.1f} match={ok}", flush=True)

    # primary-subtree-major keys: same single sort, walk from root
    for depth in (1, 2):
        sub = primary_subtree(quad, o, d, depth)
        key = (sub << 15) | make_key("oct_m4", o, d, root_lo, root_hi)
        p, l, bt = run_variant(quad, slots, o, d, key)
        ok = np.allclose(bt, ref_bt, rtol=1e-5, atol=1e-5)
        print(f"sub{depth}_oct_m4: pops={p:6d} leafs={l:6d} "
              f"per-block p={p/nb:7.1f} l={l/nb:6.1f} match={ok}", flush=True)

    if args.keys_only:
        return
    for depth in (1, 2):
        for scheme in ("oct_m4", "dq_m3"):
            key = make_key(scheme, o, d, root_lo, root_hi)
            p, l, k, bt = run_treelet(quad, slots, o, d, key, depth)
            ok = np.allclose(bt, ref_bt, rtol=1e-5, atol=1e-5)
            print(f"treelet d{depth} {scheme:7s}: pops={p:6d} leafs={l:6d} "
                  f"blocks={k} match={ok}", flush=True)


if __name__ == "__main__":
    main()
