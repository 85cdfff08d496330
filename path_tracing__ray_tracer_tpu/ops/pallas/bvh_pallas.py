"""Block-synchronous BVH traversal as a fused Pallas kernel.

Why the XLA walk loses (measured, v5e): per traversal step it gathers node
boxes and leaf triangles per ray — ~50 vector gathers at ~8-20 ns/element →
0.7 Mrays/s at mesh scale.  TPUs have no per-lane gather, but they have a
*scalar* core with cheap dynamically-indexed SMEM reads (~8 ns) sitting next
to a 8×128 VPU.  So instead of each ray walking its own path, one **block of
rays walks the tree together**:

* the flattened skip-link tree (``ops/bvh.py`` layout) and the leaf-reordered
  triangle records live in SMEM as scalar blobs;
* each step reads ONE node record (8 scalar reads), slab-tests its box
  against all ``TRAV_ROWS×128`` rays in vector registers, and reduces to a
  single block-level ``any`` bit (~140 ns — the step's dominant cost, hence
  the wide block);
* inner node: descend if any lane hit, else skip-link over the subtree;
  leaf: if any lane hit, test its ``LEAF_SIZE`` inlined triangles (zero-padded
  slots have ``det == 0`` and never hit — no per-slot masking).

Coherent blocks (camera/shadow rays) cull most of the tree; fully incoherent
blocks degrade toward a visit-everything sweep but never touch HBM.  The
occlusion variant parks lanes on first accepted hit and exits the walk early
once every lane is occluded.

Semantics match ``ops.bvh.traverse_closest`` (strict ``<`` best, same slab
and Möller–Trumbore epsilons); ties between exactly equal ``t`` may resolve
differently because visit order is SAH order (documented in QUIRKS.md).
"""
from __future__ import annotations

from functools import partial
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..v3 import V3

LANES = 128
# rays per traversal block.  Wider blocks amortize the per-step
# vector→scalar reduction over more rays, but lose coherence: a step is
# skipped only when NO lane hits the node, so the marginal lane adds visits
# faster than it shares cost.  Round-3 sweep under BVH4 + subtree key
# (experiments/measure_bvh9.py, incoherent mesh rays): rows 8/16/32 =
# 29.4/27.6/22.8 Mrays/s closest, 27.1/23.8/16.9 any — 8 rows (1024 lanes,
# the native f32 tile height) wins decisively; 64 overflows the packed
# dual-count fields (8192 ≥ 2^13).
TRAV_ROWS = 8
# stack pops per while-loop iteration in the ordered closest walk.  Measured
# flat (12.9/12.7/13.2 Mrays/s incoherent at 1/2/4, ls=16): Mosaic does not
# overlap one pop's any-reduction with the next pop's slab math, so the
# per-step cost is genuinely the vector work + serialized reduction, not
# loop overhead.  Kept at 1; the unroll machinery stays for re-measurement
# on future toolchains (experiments/measure_bvh5.py).
TRAV_UNROLL = 1
# node record: lo(3) hi(3) skip slot_base.  ``slot_base`` doubles as the
# node-kind discriminator: >= 0 is a leaf (slot offset), < 0 is an inner node
# encoding ``-(1 + axis + 4*flip)`` where ``axis`` is the child-separating
# axis and ``flip`` says the left child's centroid is the greater one — the
# ordered (stack) walk uses it to visit the near child first.
_NODE_F = 8
# BVH4 node record (two collapsed BVH2 levels): 4 child boxes (24), 4 child
# metas (leaf → slot_base ≥ 0, inner → -(1+bvh4_index), empty → never-hit
# box), then the three split codes (axis + 4*flip) of the collapsed BVH2
# parent / left / right inner nodes for near-first child ordering, + 1 pad.
_NODE4_F = 32
# per-block traversal stack capacity (SMEM scratch, int32); trees deeper than
# this fall back to the stackless skip-link kernel via the depth token gate
_STACK_CAP = 192
# slot record: v0(3) e1(3) e2(3) gid(-1 padding) n(3) — the triangle's
# stored unit normal rides along so the closest-attrs walk can emit the hit
# normal without a post-kernel per-lane gather (a measured ~75 ns/lane of
# scene_hit was XLA gathers re-fetching triangle data the kernel had in SMEM)
_SLOT_F = 13
# combined SMEM budget for tree + slot blobs (floats).  Measured on v5e:
# 260K-float (1.04 MB) SMEM operands compile and run; 280K fails remote
# compilation.  240K keeps headroom for the other scalar operands —
# roughly 20K triangles at LEAF_SIZE=4.
SMEM_BLOB_LIMIT = 240_000
# Optional unique-material id packed into the slot gid field (zero SMEM
# cost): gid = uid · 2^17 + tri_id, exact in f32 up to 2^24 (uid < 128 via
# select_table.SELECT_LIMIT, tri_id < 2^17).  The whole-bounce BVH
# megakernel (bounce_bvh_pallas) reads the winner's material without any
# per-lane gather; every closest-walk kernel decodes the tri id back out
# before emitting prim indices (``_decode_gid``).
GID_UID_SHIFT = 1 << 17
GID_TRI_MASK = GID_UID_SHIFT - 1


def _pack_gid(tri: np.ndarray, uid) -> np.ndarray:
    """Host-side slot gid values: plain tri ids, or uid-packed when ``uid``
    (per-triangle unique-material ids) is provided."""
    if uid is None:
        return tri.astype(np.float64)
    uid = np.asarray(uid)
    assert tri.size == 0 or (
        int(tri.max(initial=0)) < GID_UID_SHIFT
        and int(uid.max(initial=0)) * GID_UID_SHIFT + GID_TRI_MASK < (1 << 24)
    ), "packed gid exceeds the f32-exact integer range"
    return uid[tri].astype(np.float64) * GID_UID_SHIFT + tri.astype(np.float64)


def _decode_gid(bi: jnp.ndarray, packed: bool, offset: int = 0) -> jnp.ndarray:
    """Strip the packed uid from a closest-walk winner id (miss = -1 and
    ps winners < ``offset`` pass through).  Idempotent: decoding an already
    plain id is the identity (its uid bits are zero)."""
    if not packed:
        return bi
    tri = jnp.bitwise_and(bi - offset, jnp.int32(GID_TRI_MASK))
    return jnp.where(bi >= offset, tri + offset, bi)


def pack_blobs(arrs: dict, v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
               nrm: np.ndarray = None, uid: np.ndarray = None):
    """Flatten a ``build_bvh`` result + triangle vertices into the two scalar
    blobs the kernel consumes.  Leaf triangles are re-ordered into contiguous
    ``LEAF_SIZE`` slot groups so a leaf visit is one dynamic base + static
    offsets; padding slots are all-zero (degenerate → never hit).

    ``nrm`` (optional) is the per-triangle stored unit normal — pass the
    SAME array the scene compiler puts in ``triangles.normal`` so the
    in-kernel attrs path is bit-identical to the gather path; defaults to
    the normalized cross product.  ``uid`` (optional) packs each triangle's
    unique-material id into the gid field (see ``GID_UID_SHIFT``).

    Returns ``(tree_blob, slot_blob, depth)`` — float32 ``(1, K)`` numpy
    arrays plus the tree's maximum node depth (root = 1), which bounds the
    ordered walk's stack.
    """
    lo, hi, skip = arrs["lo"], arrs["hi"], arrs["skip"]
    is_leaf, slots = arrs["is_leaf"], arrs["slots"]
    m, leaf_size = slots.shape
    e1 = v1 - v0
    e2 = v2 - v0
    if nrm is None:
        nrm = np.cross(e1, e2)
        nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-30)
    nrm = np.asarray(nrm, np.float32)

    tree = np.zeros((m, _NODE_F), np.float32)
    tree[:, 0:3] = lo
    tree[:, 3:6] = hi
    tree[:, 6] = skip.astype(np.float32)

    leaf_ids = np.where(is_leaf)[0]
    slot_base = np.full(m, -1.0, np.float32)
    slot_base[leaf_ids] = np.arange(len(leaf_ids), dtype=np.float32) * leaf_size
    tree[:, 7] = slot_base

    # inner-node ordering code for the stack walk.  DFS layout invariant
    # (ops/bvh.py flatten): left(i) = i + 1, right(i) = skip[i + 1] — the left
    # child's skip always lands on the right subtree root.
    inner = np.where(~is_leaf)[0]
    codes = _split_codes(lo, hi, skip, is_leaf)
    if len(inner):
        tree[inner, 7] = -(1.0 + codes[inner])

    # max depth via the same child pointers (iterative, host side)
    depth = 1
    stack = [(0, 1)]
    while stack:
        node, d = stack.pop()
        depth = max(depth, d)
        if not is_leaf[node]:
            stack.append((node + 1, d + 1))
            stack.append((int(skip[node + 1]), d + 1))

    rec = np.zeros((len(leaf_ids) * leaf_size, _SLOT_F), np.float32)
    rec[:, 9] = -1.0
    flat = slots[leaf_ids].reshape(-1)  # (n_leaves*leaf_size,) tri ids, -1 pad
    valid = flat >= 0
    tri = flat[valid]
    rows = np.where(valid)[0]
    rec[rows, 0:3] = v0[tri]
    rec[rows, 3:6] = e1[tri]
    rec[rows, 6:9] = e2[tri]
    rec[rows, 9] = _pack_gid(tri, uid).astype(np.float32)
    rec[rows, 10:13] = nrm[tri]

    return tree.reshape(1, -1), rec.reshape(1, -1), depth


def pack_leaf_mat(arrs: dict, v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                  nrm: np.ndarray = None, uid: np.ndarray = None) -> np.ndarray:
    """Leaf-triangle coefficient matrix for the MXU leaf test.

    Möller–Trumbore's four decision quantities are each LINEAR in the
    per-ray feature vector ``f = [d, m=o×d, o, 1]`` (validated numerically
    against the scalar MT chain):

        det   = d·n'                 with n' = e2×e1
        u·det = m·e2 − d·(e2×v0)
        v·det = −m·e1 − d·(v0×e1)
        t·det = n'·v0 − o·n'

    so one leaf visit becomes ONE MXU matmul ``P_leafᵀ @ F`` over the whole
    ray block instead of ``leaf_size`` serial ~45-op VPU evaluations — the
    leaf test is the measured majority of the BVH4 walk (BENCHMARKS.md).
    The stored normal and the triangle id ride along as constant rows
    (dotted with the ``1`` feature) for the closest/attrs variant.

    Layout: ``(16, G·128)`` f32 — 16 feature rows (10 used), and per leaf
    group ``g`` (same slot-group numbering as ``pack_blobs``) a 128-column
    block of 8 quantity sub-blocks × 16 slots:
    ``[det₀..₁₅ | u·det | v·det | t·det | nx | ny | nz | gid]``.
    Zero-padded slots give ``det == 0`` and can never win (same contract as
    the all-zero slot records).
    """
    is_leaf, slots = arrs["is_leaf"], arrs["slots"]
    leaf_size = slots.shape[1]
    assert leaf_size <= 16 and 128 % leaf_size == 0
    leaf_ids = np.where(is_leaf)[0]
    g_total = len(leaf_ids)
    v0 = np.asarray(v0, np.float64)
    e1 = np.asarray(v1, np.float64) - v0
    e2 = np.asarray(v2, np.float64) - v0
    if nrm is None:
        n = np.cross(e1, e2)
        n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-30)
    else:
        n = np.asarray(nrm, np.float64)

    flat = slots[leaf_ids].reshape(-1)  # (G*leaf_size,) tri ids, -1 pad
    valid = flat >= 0
    tri = flat[valid]
    rows = np.where(valid)[0]
    g_of = rows // leaf_size
    k_of = rows % leaf_size

    P = np.zeros((16, g_total * 128), np.float32)
    npr = np.cross(e2[tri], e1[tri])  # n' = e2×e1  (f64 like pack_blobs' prep)

    def put(q, feat_rows, vals):
        """quantity block q, feature rows, per-tri coefficient columns."""
        cols = g_of * 128 + q * 16 + k_of
        for r, v in zip(feat_rows, vals.T if vals.ndim == 2 else [vals]):
            P[r, cols] = v.astype(np.float32)

    put(0, [0, 1, 2], npr)                                    # det: d·n'
    put(1, [0, 1, 2], -np.cross(e2[tri], v0[tri]))            # u·det: d-part
    put(1, [3, 4, 5], e2[tri])                                # u·det: m-part
    put(2, [0, 1, 2], -np.cross(v0[tri], e1[tri]))            # v·det: d-part
    put(2, [3, 4, 5], -e1[tri])                               # v·det: m-part
    put(3, [6, 7, 8], -npr)                                   # t·det: o-part
    put(3, [9], np.einsum("ij,ij->i", npr, v0[tri]))          # t·det: const
    put(4, [9], n[tri][:, 0])                                 # nx
    put(5, [9], n[tri][:, 1])                                 # ny
    put(6, [9], n[tri][:, 2])                                 # nz
    put(7, [9], _pack_gid(tri, uid))                          # gid
    return P


def _split_codes(lo, hi, skip, is_leaf) -> np.ndarray:
    """Per-node split code ``axis + 4*flip`` (0..7) for inner nodes, 0 for
    leaves.  ``axis`` is the dominant child-centroid-separating axis and
    ``flip`` says the *left* child's centroid is the greater one; near-first
    walks visit the child whose centroid lies toward the ray direction."""
    m = len(skip)
    codes = np.zeros(m, np.float32)
    inner = np.where(~is_leaf)[0]
    if len(inner):
        left = inner + 1
        right = skip[left]
        lc = (lo[left] + hi[left]) * 0.5
        rc = (lo[right] + hi[right]) * 0.5
        diff = rc - lc
        axis = np.argmax(np.abs(diff), axis=1)
        flip = diff[np.arange(len(inner)), axis] < 0.0
        codes[inner] = axis + 4.0 * flip
    return codes


def pack_blobs4(arrs: dict):
    """Collapse the BVH2 into a BVH4 blob for the 4-wide traversal kernels.

    Each BVH4 node merges a BVH2 inner node with its two children: the four
    child slots are the grandchildren (pair 0 = left subtree, pair 1 = right),
    with BVH2-leaf children occupying the pair's first slot and an empty
    (never-hit box) second slot.  Leaf children reference the SAME slot blob
    as ``pack_blobs`` (identical slot_base numbering), so the two tree shapes
    share triangle records.  Returns ``(quad_blob (1, 32·M4) f32, depth4)``
    or ``(None, 0)`` when the root is a leaf (no tree to collapse).
    """
    lo, hi, skip = arrs["lo"], arrs["hi"], arrs["skip"]
    is_leaf, slots = arrs["is_leaf"], arrs["slots"]
    m, leaf_size = slots.shape
    if is_leaf[0]:
        return None, 0

    leaf_ids = np.where(is_leaf)[0]
    slot_base = np.full(m, -1, np.int64)
    slot_base[leaf_ids] = np.arange(len(leaf_ids), dtype=np.int64) * leaf_size
    codes = _split_codes(lo, hi, skip, is_leaf)

    records = []
    max_depth = [1]

    import sys

    limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(limit, 8 * m + 1000))
    try:

        def build(i: int, d: int) -> int:
            """Emit the BVH4 node for BVH2 inner node ``i``; returns its index."""
            me = len(records)
            records.append(None)
            max_depth[0] = max(max_depth[0], d)
            l, r = i + 1, int(skip[i + 1])
            child_slots = []
            for sub in (l, r):
                if is_leaf[sub]:
                    child_slots.extend([(sub, True), None])
                else:
                    a, b2 = sub + 1, int(skip[sub + 1])
                    child_slots.extend([(a, bool(is_leaf[a])),
                                        (b2, bool(is_leaf[b2]))])

            rec = np.zeros(_NODE4_F, np.float32)
            for c, s in enumerate(child_slots):
                if s is None:
                    # degenerate point box at +3e38: never hit (an *inverted*
                    # box would NOT work — _slab normalizes min/max per axis)
                    rec[6 * c : 6 * c + 3] = 3e38
                    rec[6 * c + 3 : 6 * c + 6] = 3e38
                    rec[24 + c] = -1.0  # inner→node 0; unreachable (no box hit)
                else:
                    nid, lf = s
                    rec[6 * c : 6 * c + 3] = lo[nid]
                    rec[6 * c + 3 : 6 * c + 6] = hi[nid]
                    rec[24 + c] = (
                        float(slot_base[nid]) if lf else -(1.0 + build(nid, d + 1))
                    )
            rec[28] = codes[i]
            rec[29] = 0.0 if is_leaf[l] else codes[l]
            rec[30] = 0.0 if is_leaf[r] else codes[r]
            records[me] = rec
            return me

        build(0, 1)
    finally:
        sys.setrecursionlimit(limit)

    return np.stack(records).astype(np.float32).reshape(1, -1), max_depth[0]


def _packed(bvh) -> bool:
    """True when this tree's slot gids carry packed material uids (static:
    shape-encoded by ``uid_token``, like ``depth_token``)."""
    return getattr(bvh, "uid_token", None) is not None


def fits_smem_bvh(bvh) -> bool:
    if bvh is None or bvh.tree_blob is None or bvh.slot_blob is None:
        return False
    # budget the blob the dispatch will actually bind as the SMEM operand
    tree = bvh.quad_blob if _quad_ok(bvh) else bvh.tree_blob
    return int(tree.shape[1]) + int(bvh.slot_blob.shape[1]) <= SMEM_BLOB_LIMIT


def _slab(lox, loy, loz, hix, hiy, hiz, ox, oy, oz, ivx, ivy, ivz, t_min, far):
    """Slab test of one box (scalars) against the ray block (vectors); the
    formulas mirror ``ops.bvh.traverse_closest`` exactly."""
    a = (lox - ox) * ivx
    b = (hix - ox) * ivx
    tx0, tx1 = jnp.minimum(a, b), jnp.maximum(a, b)
    a = (loy - oy) * ivy
    b = (hiy - oy) * ivy
    ty0, ty1 = jnp.minimum(a, b), jnp.maximum(a, b)
    a = (loz - oz) * ivz
    b = (hiz - oz) * ivz
    tz0, tz1 = jnp.minimum(a, b), jnp.maximum(a, b)
    enter = jnp.maximum(jnp.maximum(tx0, ty0), jnp.maximum(tz0, t_min))
    exit_ = jnp.minimum(jnp.minimum(tx1, ty1), jnp.minimum(tz1, far))
    return enter <= exit_


def _leaf_tris(slot_ref, base_i, leaf_size, ox, oy, oz, dx, dy, dz, t_min, update):
    """Test ``leaf_size`` consecutive slot records starting at ``base_i``;
    ``update(carry, win_mask_without_bound, t, gid, u, v, n3)`` folds each
    candidate (``u``/``v`` are the Möller–Trumbore barycentrics already in
    registers, ``n3`` the slot's stored unit normal as three scalars —
    callers that only need occlusion/t ignore the extras)."""
    out = None
    for k in range(leaf_size):
        o = base_i * _SLOT_F + k * _SLOT_F
        v0x, v0y, v0z = slot_ref[0, o], slot_ref[0, o + 1], slot_ref[0, o + 2]
        e1x, e1y, e1z = slot_ref[0, o + 3], slot_ref[0, o + 4], slot_ref[0, o + 5]
        e2x, e2y, e2z = slot_ref[0, o + 6], slot_ref[0, o + 7], slot_ref[0, o + 8]
        gid = slot_ref[0, o + 9]
        n3 = (slot_ref[0, o + 10], slot_ref[0, o + 11], slot_ref[0, o + 12])
        # Möller–Trumbore, same formulation/epsilons as ops.bvh
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        det = e1x * hx + e1y * hy + e1z * hz
        ok = jnp.abs(det) > 1e-6
        inv_det = 1.0 / jnp.where(ok, det, 1.0)
        sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
        u = inv_det * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = inv_det * (dx * qx + dy * qy + dz * qz)
        t = inv_det * (e2x * qx + e2y * qy + e2z * qz)
        win = (
            ok & (gid >= 0.0)
            & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > t_min)
        )
        out = update(out, win, t, gid, u, v, n3)
    return out


def _bvh_closest_kernel(
    m, leaf_size, t_min, t_max,
    tree_ref, slot_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    bt_ref, bi_ref,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ivx = 1.0 / jnp.where(jnp.abs(dx) > 1e-12, dx, 1e-12)
    ivy = 1.0 / jnp.where(jnp.abs(dy) > 1e-12, dy, 1e-12)
    ivz = 1.0 / jnp.where(jnp.abs(dz) > 1e-12, dz, 1e-12)

    def cond(carry):
        cursor, *_ = carry
        return cursor < m

    def body(carry):
        cursor, best_t, best_i = carry
        b = cursor * _NODE_F
        box_hit = _slab(
            tree_ref[0, b], tree_ref[0, b + 1], tree_ref[0, b + 2],
            tree_ref[0, b + 3], tree_ref[0, b + 4], tree_ref[0, b + 5],
            ox, oy, oz, ivx, ivy, ivz, t_min, best_t,
        )
        skip_i = tree_ref[0, b + 6].astype(jnp.int32)
        base_f = tree_ref[0, b + 7]
        any_hit = jnp.any(box_hit)
        is_leaf = base_f >= 0.0

        def leaf_fn(args):
            bt, bi = args

            def upd(carry2, win, t, gid, *_attrs):
                bt2, bi2 = carry2 if carry2 is not None else (bt, bi)
                # per-lane box mask for exact parity with ops.bvh (a lane
                # whose slab test failed must not accept borderline-FP hits)
                w = win & box_hit & (t < bt2)
                bt2 = jnp.where(w, t, bt2)
                bi2 = jnp.where(w, gid.astype(jnp.int32), bi2)
                return bt2, bi2

            return _leaf_tris(
                slot_ref, base_f.astype(jnp.int32), leaf_size,
                ox, oy, oz, dx, dy, dz, t_min, upd,
            )

        best_t, best_i = jax.lax.cond(
            any_hit & is_leaf, leaf_fn, lambda a: a, (best_t, best_i)
        )
        cursor = jnp.where(any_hit & ~is_leaf, cursor + 1, skip_i)
        return cursor, best_t, best_i

    init = (
        jnp.int32(0),
        jnp.full_like(ox, t_max),
        jnp.full(ox.shape, -1, jnp.int32),
    )
    _c, best_t, best_i = jax.lax.while_loop(cond, body, init)
    bt_ref[:] = best_t
    bi_ref[:] = best_i


def _bvh_closest_ordered_kernel(
    m, leaf_size, t_min, t_max,
    tree_ref, slot_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    bt_ref, bi_ref, stack_ref,
):
    """Front-to-back stack walk: the block visits each inner node's *near*
    child first (near = lower child centroid on the node's separating axis,
    oriented by the block's majority direction sign), so ``best_t`` tightens
    early and the per-lane ``far = best_t`` slab bound culls far subtrees the
    stackless preorder walk would still visit.  The stack is one scalar SMEM
    array per block — classic packet traversal mapped onto scalar-core
    control + VPU lane tests."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ivx = 1.0 / jnp.where(jnp.abs(dx) > 1e-12, dx, 1e-12)
    ivy = 1.0 / jnp.where(jnp.abs(dy) > 1e-12, dy, 1e-12)
    ivz = 1.0 / jnp.where(jnp.abs(dz) > 1e-12, dz, 1e-12)

    # block majority direction sign per axis (one-time vector reduce)
    pgx = jnp.sum(jnp.where(dx > 0, 1.0, -1.0)) >= 0.0
    pgy = jnp.sum(jnp.where(dy > 0, 1.0, -1.0)) >= 0.0
    pgz = jnp.sum(jnp.where(dz > 0, 1.0, -1.0)) >= 0.0

    stack_ref[0] = jnp.int32(0)

    def cond(carry):
        step, sp, *_ = carry
        return (sp > 0) & (step < m + 1 + TRAV_UNROLL)

    def body1(carry):
        """One stack pop, guarded by ``sp > 0`` so ``TRAV_UNROLL`` copies can
        run back-to-back between loop-condition checks (the exhausted case is
        a masked no-op)."""
        step, sp, best_t, best_i = carry
        alive = sp > 0
        sp = jnp.maximum(sp - 1, 0)
        node = stack_ref[sp]
        b = node * _NODE_F
        box_hit = _slab(
            tree_ref[0, b], tree_ref[0, b + 1], tree_ref[0, b + 2],
            tree_ref[0, b + 3], tree_ref[0, b + 4], tree_ref[0, b + 5],
            ox, oy, oz, ivx, ivy, ivz, t_min, best_t,
        ) & alive
        any_hit = jnp.any(box_hit)
        base_f = tree_ref[0, b + 7]
        is_leaf = base_f >= 0.0

        def leaf_fn(args):
            bt, bi = args

            def upd(carry2, win, t, gid, *_attrs):
                bt2, bi2 = carry2 if carry2 is not None else (bt, bi)
                w = win & box_hit & (t < bt2)
                bt2 = jnp.where(w, t, bt2)
                bi2 = jnp.where(w, gid.astype(jnp.int32), bi2)
                return bt2, bi2

            return _leaf_tris(
                slot_ref, base_f.astype(jnp.int32), leaf_size,
                ox, oy, oz, dx, dy, dz, t_min, upd,
            )

        best_t, best_i = jax.lax.cond(
            any_hit & is_leaf, leaf_fn, lambda a: a, (best_t, best_i)
        )

        # inner node: push far child, then near (near popped first)
        k = (-base_f - 1.0).astype(jnp.int32)  # axis + 4*flip (leaf: garbage)
        axis = jnp.remainder(k, 4)
        flip = (k // 4) > 0
        pos = jnp.where(axis == 0, pgx, jnp.where(axis == 1, pgy, pgz))
        near_is_left = jnp.logical_xor(pos, flip)
        left = node + 1
        # clamp: the read is speculative (leaves take the push=False path but
        # still execute it), and node may be the last record
        right = tree_ref[
            0, jnp.minimum(left, m - 1) * _NODE_F + 6
        ].astype(jnp.int32)
        near = jnp.where(near_is_left, left, right)
        far_child = jnp.where(near_is_left, right, left)
        push = any_hit & ~is_leaf

        @pl.when(push)
        def _():
            stack_ref[sp] = far_child
            stack_ref[sp + 1] = near

        sp = jnp.where(push, sp + 2, sp)
        return step + 1, sp, best_t, best_i

    def body(carry):
        for _ in range(TRAV_UNROLL):
            carry = body1(carry)
        return carry

    init = (
        jnp.int32(0),
        jnp.int32(1),
        jnp.full_like(ox, t_max),
        jnp.full(ox.shape, -1, jnp.int32),
    )
    _s, _sp, best_t, best_i = jax.lax.while_loop(cond, body, init)
    bt_ref[:] = best_t
    bi_ref[:] = best_i


def _bvh_any_kernel(
    m, leaf_size, t_min,
    tree_ref, slot_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    limit_ref, found_ref,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    limit = limit_ref[:]
    ivx = 1.0 / jnp.where(jnp.abs(dx) > 1e-12, dx, 1e-12)
    ivy = 1.0 / jnp.where(jnp.abs(dy) > 1e-12, dy, 1e-12)
    ivz = 1.0 / jnp.where(jnp.abs(dz) > 1e-12, dz, 1e-12)

    # ``found`` is carried as float32 0/1: Mosaic cannot legalize lax.cond
    # branches over boolean vector carries (scf.if legalization failure)
    def cond(carry):
        cursor, found = carry
        return (cursor < m) & (jnp.min(found) < 0.5)

    def body(carry):
        cursor, found = carry
        b = cursor * _NODE_F
        # unfound lanes bound the walk by their shadow limit; found lanes are
        # parked (far < t_min fails every slab test)
        far = jnp.where(found > 0.5, jnp.float32(-1.0), limit)
        box_hit = _slab(
            tree_ref[0, b], tree_ref[0, b + 1], tree_ref[0, b + 2],
            tree_ref[0, b + 3], tree_ref[0, b + 4], tree_ref[0, b + 5],
            ox, oy, oz, ivx, ivy, ivz, t_min, far,
        )
        skip_i = tree_ref[0, b + 6].astype(jnp.int32)
        base_f = tree_ref[0, b + 7]
        any_hit = jnp.any(box_hit)
        is_leaf = base_f >= 0.0

        def leaf_fn(fnd):
            def upd(carry2, win, t, _gid, *_attrs):
                f = carry2 if carry2 is not None else fnd
                hit_now = win & box_hit & (t < limit)
                return jnp.maximum(f, hit_now.astype(jnp.float32))

            return _leaf_tris(
                slot_ref, base_f.astype(jnp.int32), leaf_size,
                ox, oy, oz, dx, dy, dz, t_min, upd,
            )

        found = jax.lax.cond(any_hit & is_leaf, leaf_fn, lambda f: f, found)
        cursor = jnp.where(any_hit & ~is_leaf, cursor + 1, skip_i)
        return cursor, found

    init = (jnp.int32(0), (limit <= 0.0).astype(jnp.float32))
    _c, found = jax.lax.while_loop(cond, body, init)
    found_ref[:] = found


def _bvh_any_ordered_kernel(
    m, leaf_size, t_min,
    tree_ref, slot_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    limit_ref, found_ref, stack_ref,
):
    """Occlusion walk with the same near-first stack order as the closest
    kernel: occluded lanes park sooner (their ``far`` collapses), so blocks
    skip more subtrees and the all-found exit fires earlier.  Visit order
    cannot change the result — occlusion is an existence test."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    limit = limit_ref[:]
    ivx = 1.0 / jnp.where(jnp.abs(dx) > 1e-12, dx, 1e-12)
    ivy = 1.0 / jnp.where(jnp.abs(dy) > 1e-12, dy, 1e-12)
    ivz = 1.0 / jnp.where(jnp.abs(dz) > 1e-12, dz, 1e-12)

    pgx = jnp.sum(jnp.where(dx > 0, 1.0, -1.0)) >= 0.0
    pgy = jnp.sum(jnp.where(dy > 0, 1.0, -1.0)) >= 0.0
    pgz = jnp.sum(jnp.where(dz > 0, 1.0, -1.0)) >= 0.0

    stack_ref[0] = jnp.int32(0)

    def cond(carry):
        step, sp, found = carry
        return (step < m + 2) & (sp > 0) & (jnp.min(found) < 0.5)

    def body(carry):
        step, sp, found = carry
        sp = sp - 1
        node = stack_ref[sp]
        b = node * _NODE_F
        far = jnp.where(found > 0.5, jnp.float32(-1.0), limit)
        box_hit = _slab(
            tree_ref[0, b], tree_ref[0, b + 1], tree_ref[0, b + 2],
            tree_ref[0, b + 3], tree_ref[0, b + 4], tree_ref[0, b + 5],
            ox, oy, oz, ivx, ivy, ivz, t_min, far,
        )
        any_hit = jnp.any(box_hit)
        base_f = tree_ref[0, b + 7]
        is_leaf = base_f >= 0.0

        def leaf_fn(fnd):
            def upd(carry2, win, t, _gid, *_attrs):
                f = carry2 if carry2 is not None else fnd
                hit_now = win & box_hit & (t < limit)
                return jnp.maximum(f, hit_now.astype(jnp.float32))

            return _leaf_tris(
                slot_ref, base_f.astype(jnp.int32), leaf_size,
                ox, oy, oz, dx, dy, dz, t_min, upd,
            )

        found = jax.lax.cond(any_hit & is_leaf, leaf_fn, lambda f: f, found)

        k = (-base_f - 1.0).astype(jnp.int32)
        axis = jnp.remainder(k, 4)
        flip = (k // 4) > 0
        pos = jnp.where(axis == 0, pgx, jnp.where(axis == 1, pgy, pgz))
        near_is_left = jnp.logical_xor(pos, flip)
        left = node + 1
        right = tree_ref[
            0, jnp.minimum(left, m - 1) * _NODE_F + 6
        ].astype(jnp.int32)
        near = jnp.where(near_is_left, left, right)
        far_child = jnp.where(near_is_left, right, left)
        push = any_hit & ~is_leaf

        @pl.when(push)
        def _():
            stack_ref[sp] = far_child
            stack_ref[sp + 1] = near

        sp = jnp.where(push, sp + 2, sp)
        return step + 1, sp, found

    # lanes whose limit is <= 0 (callers pass -1 for don't-care lanes, e.g.
    # NEE shadow rays of lanes that missed the scene) start pre-found: they
    # add no walk work and count toward the all-found early exit.  Their
    # reported occlusion is True ("don't care"); callers mask it.
    init = (jnp.int32(0), jnp.int32(1), (limit <= 0.0).astype(jnp.float32))
    _s, _sp, found = jax.lax.while_loop(cond, body, init)
    found_ref[:] = found


# packed dual-count reductions need every per-child count < 2^13
_PACK_FIELD = 13
# ONE cross-lane reduction per pop instead of two: reduce each child's hit
# mask over the sublane axis first ((R,128) -> (1,128) row-any, pure vector
# work), then pack the four row-any bits into BYTE fields of one int32 lane
# vector and cross-lane-sum once — per-child counts are <= 128 so four
# 8-bit fields fit int32 exactly.  The vector->scalar reduction is the
# measured per-pop bottleneck (BENCHMARKS.md); this halves its count again
# after BVH4 halved it once.  MEASURED FLAT on v5e (experiments/
# measure_breduce.py, clean reps: dual 29.9/28.4 vs byte 30.9/28.0 Mrays/s
# closest/any, exact match 1.0) — the sublane half of the reduction is not
# the serialized cost, and post-BVH4 the walk is leaf-dominated anyway.
# Kept gated off as the recorded negative result.
BVH_BYTE_REDUCE = False
# ONE bitwise-OR reduction (4 any-bits in one int32) instead of TWO packed
# sum-reductions per pop.  UNSUPPORTED on the current toolchain: Mosaic has
# no lowering for ``lax.reduce`` (NotImplementedError: "Unimplemented
# primitive ... reduce", measured 2026-08 round 3), and no other one-shot
# 4-field reduction fits int32 (3×11-bit counts at 1024 lanes already need
# 33 bits).  Keep False until Mosaic grows or-reduce; interpret mode runs
# either form (tested).
BVH_OR_REDUCE = False


def _leaf_any_mxu(leafmat_ref, featm, base_f, leaf_size, t_min,
                  box_hit, found):
    """Occlusion leaf visit as ONE MXU matmul + batched sign tests.

    ``featm`` is the block's (16, W) ray-feature matrix ([d, m=o×d, o, 1,
    limit, 0…] rows, W = block lanes); the leaf's (16, 128) coefficient
    slice (``pack_leaf_mat``) contracts against it on the feature axis, so
    the 16 serial ~40-op Möller–Trumbore slot tests collapse into one
    (128, W) matmul and ~12 vector ops on (16, W) quantity rows.  Division
    free: with s2 = det² ≥ 0, ``u ≥ 0 ⇔ u·det·det ≥ 0`` etc., and the
    per-lane limit rides featm row 10 so no narrow↔wide relayout is needed
    until the final row-any.  Same decision semantics as ``_leaf_tris``'s
    occlusion update up to f32 rounding of the linear forms (boundary rays
    within ~1e-6 of an edge/plane may flip — measure-zero; QUIRKS.md)."""
    col0 = (base_f.astype(jnp.int32) // leaf_size) * 128
    P = leafmat_ref[:, pl.ds(col0, 128)]
    out = jax.lax.dot_general(
        P, featm, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (128, W): 16-slot blocks of det | u·det | v·det | t·det | …
    det = out[0:16, :]
    ud = out[16:32, :] * det
    vd = out[32:48, :] * det
    td = out[48:64, :] * det
    s2 = det * det
    limw = featm[10:11, :]
    win = (
        (jnp.abs(det) > 1e-6)
        & (ud >= 0.0) & (ud <= s2) & (vd >= 0.0) & (ud + vd <= s2)
        & (td > t_min * s2) & (td < limw * s2)
    )
    # bool (1, W) -> (R, 128) shape casts don't lower (vector<i1> reshape);
    # relayout in f32 and re-threshold
    hit_w = jnp.any(win, axis=0, keepdims=True).astype(jnp.float32)
    hit_n = hit_w.reshape(box_hit.shape) > 0.5
    return jnp.maximum(found, (hit_n & box_hit).astype(jnp.float32))


def _leaf_closest_mxu(leafmat_ref, featm, base_f, leaf_size, t_min,
                      box_hit, best, with_attrs, gid_offset):
    """Closest-hit leaf visit on the MXU (same matmul as ``_leaf_any_mxu``).

    The per-visit winner is the minimum-``t`` winning slot with ties to the
    lowest slot index — identical to the sequential strict-``<`` slot scan.
    Attrs come from the same matmul: the stored normal and the triangle id
    ride constant coefficient rows, and the winner's row is extracted with a
    first-match one-hot (exact: the non-selected rows contribute 0.0 to the
    sum).  ``t`` and the barycentrics are single-rounded (``num/det``) where
    the scalar path double-rounds (``inv_det·num``) — boundary ties may
    resolve differently (QUIRKS.md, measure-zero)."""
    col0 = (base_f.astype(jnp.int32) // leaf_size) * 128
    P = leafmat_ref[:, pl.ds(col0, 128)]
    out = jax.lax.dot_general(
        P, featm, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    det = out[0:16, :]
    un = out[16:32, :]
    vn = out[32:48, :]
    tn = out[48:64, :]
    s2 = det * det
    ud = un * det
    vd = vn * det
    ok = jnp.abs(det) > 1e-6
    win = ok & (ud >= 0.0) & (ud <= s2) & (vd >= 0.0) & (ud + vd <= s2)
    t = tn / jnp.where(ok, det, 1.0)
    win = win & (t > t_min)
    tinf = jnp.where(win, t, jnp.float32(3.4e38))
    tmin_w = jnp.min(tinf, axis=0, keepdims=True)  # (1, W)
    rows16 = jax.lax.broadcasted_iota(jnp.int32, tinf.shape, 0)
    rid = jnp.min(jnp.where(tinf <= tmin_w, rows16, 16), axis=0,
                  keepdims=True)
    onehot = rows16 == rid

    def sel(q):
        return jnp.sum(jnp.where(onehot, q, 0.0), axis=0, keepdims=True)

    shape_n = box_hit.shape
    tm = tmin_w.reshape(shape_n)
    w = box_hit & (tm < best[0])
    g = sel(out[112:128, :]).reshape(shape_n).astype(jnp.int32)
    if gid_offset:
        g = g + gid_offset
    res = (jnp.where(w, tm, best[0]), jnp.where(w, g, best[1]))
    if with_attrs:
        dsel = sel(det).reshape(shape_n)
        dsafe = jnp.where(dsel != 0.0, dsel, 1.0)
        res = res + (
            jnp.where(w, sel(un).reshape(shape_n) / dsafe, best[2]),
            jnp.where(w, sel(vn).reshape(shape_n) / dsafe, best[3]),
            jnp.where(w, sel(out[64:80, :]).reshape(shape_n), best[4]),
            jnp.where(w, sel(out[80:96, :]).reshape(shape_n), best[5]),
            jnp.where(w, sel(out[96:112, :]).reshape(shape_n), best[6]),
        )
    return res


def _quad_pop_common(tree_ref, node, ox, oy, oz, ivx, ivy, ivz, t_min, far):
    """Shared BVH4 pop front half: 4 child slab tests + ONE reduction for
    the four block-level any bits (the vector→scalar reduction is the
    measured per-step bottleneck; an or-reduce of 4 packed bits replaces the
    earlier two 13-bit-field sum-reductions, which themselves replaced four
    ``any``s)."""
    b = node * _NODE4_F
    hits = []
    for c in range(4):
        o = b + 6 * c
        hits.append(
            _slab(
                tree_ref[0, o], tree_ref[0, o + 1], tree_ref[0, o + 2],
                tree_ref[0, o + 3], tree_ref[0, o + 4], tree_ref[0, o + 5],
                ox, oy, oz, ivx, ivy, ivz, t_min, far,
            )
        )
    if BVH_OR_REDUCE:
        bits = (
            hits[0].astype(jnp.int32)
            + hits[1].astype(jnp.int32) * 2
            + hits[2].astype(jnp.int32) * 4
            + hits[3].astype(jnp.int32) * 8
        )
        r = jax.lax.reduce(bits, jnp.int32(0), jax.lax.bitwise_or,
                           tuple(range(bits.ndim)))
        anyc = ((r & 1) > 0, (r & 2) > 0, (r & 4) > 0, (r & 8) > 0)
    elif BVH_BYTE_REDUCE:
        # row-any per child (sublane reduction, vector work), then one
        # cross-lane sum of four byte-packed fields (counts <= 128 rows of
        # lanes... <= 128 lanes, each contributing 0/1 per field)
        packed = (
            jnp.any(hits[0], axis=0, keepdims=True).astype(jnp.int32)
            + jnp.any(hits[1], axis=0, keepdims=True).astype(jnp.int32) * (1 << 8)
            + jnp.any(hits[2], axis=0, keepdims=True).astype(jnp.int32) * (1 << 16)
            + jnp.any(hits[3], axis=0, keepdims=True).astype(jnp.int32) * (1 << 24)
        )
        s = jnp.sum(packed)
        anyc = (
            (s & 0xFF) > 0,
            ((s >> 8) & 0xFF) > 0,
            ((s >> 16) & 0xFF) > 0,
            ((s >> 24) & 0xFF) > 0,
        )
    else:
        one = jnp.int32(1)
        shift = jnp.int32(1 << _PACK_FIELD)
        s01 = jnp.sum(hits[0].astype(jnp.int32) * one
                      + hits[1].astype(jnp.int32) * shift)
        s23 = jnp.sum(hits[2].astype(jnp.int32) * one
                      + hits[3].astype(jnp.int32) * shift)
        mask = jnp.int32((1 << _PACK_FIELD) - 1)
        anyc = (
            (s01 & mask) > 0,
            (s01 >> _PACK_FIELD) > 0,
            (s23 & mask) > 0,
            (s23 >> _PACK_FIELD) > 0,
        )
    metas = tuple(tree_ref[0, b + 24 + c] for c in range(4))
    return b, hits, anyc, metas


def _quad_push_order(tree_ref, b, metas, anyc, pg_of):
    """Near-first ordering of the 4 children from the three stored split
    codes: pair order by the collapsed parent's code, within-pair order by
    each subtree's code.  Returns the push sequence (farthest first)."""
    def near_first(k):
        axis = jnp.remainder(k, 4)
        flip = (k // 4) > 0
        return jnp.logical_xor(pg_of(axis), flip)

    k0 = tree_ref[0, b + 28].astype(jnp.int32)
    k1 = tree_ref[0, b + 29].astype(jnp.int32)
    k2 = tree_ref[0, b + 30].astype(jnp.int32)
    p0_near = near_first(k0)      # pair0 (left subtree) is the near pair
    c0_near = near_first(k1)      # within pair0, child 0 is near
    c2_near = near_first(k2)      # within pair1, child 2 is near

    def sel(c, a, b2):
        return jnp.where(c, a, b2)

    m_p0n, a_p0n = sel(c0_near, metas[0], metas[1]), sel(c0_near, anyc[0], anyc[1])
    m_p0f, a_p0f = sel(c0_near, metas[1], metas[0]), sel(c0_near, anyc[1], anyc[0])
    m_p1n, a_p1n = sel(c2_near, metas[2], metas[3]), sel(c2_near, anyc[2], anyc[3])
    m_p1f, a_p1f = sel(c2_near, metas[3], metas[2]), sel(c2_near, anyc[3], anyc[2])
    # pushed first = visited last: far pair's far child … near pair's near
    return (
        (sel(p0_near, m_p1f, m_p0f), sel(p0_near, a_p1f, a_p0f)),
        (sel(p0_near, m_p1n, m_p0n), sel(p0_near, a_p1n, a_p0n)),
        (sel(p0_near, m_p0f, m_p1f), sel(p0_near, a_p0f, a_p1f)),
        (sel(p0_near, m_p0n, m_p1n), sel(p0_near, a_p0n, a_p1n)),
    )


def _bvh4_walk(m4, leaf_size, t_min, tree_ref, slot_ref, stack_ref,
               start_node, ox, oy, oz, dx, dy, dz, bt0, bi0,
               with_attrs: bool = False, attrs0=None, gid_offset: int = 0,
               featm=None, leafmat_ref=None):
    """Shared front-to-back BVH4 stack walk from ``start_node`` with a
    carried (best_t, best_i): one pop slab-tests FOUR child boxes and pays
    TWO packed reductions, replacing ~3 BVH2 pops (1 reduction each) — the
    reduction + scalar-control share of the ~270 ns/step BVH2 cost is what
    this halves.  Same per-lane hit math as the BVH2 kernels.

    ``with_attrs`` additionally carries the winning slot's Möller–Trumbore
    barycentrics and stored normal (5 extra selects per slot), so the
    caller needs NO post-kernel gathers to build the hit record; returns
    ``(bt, bi)`` or ``(bt, bi, u, v, nx, ny, nz)``.  ``attrs0`` optionally
    seeds that attrs carry (u, v, nx, ny, nz) — the fused scene kernel
    passes the plane/sphere/quad sweep's winner attrs so a triangle only
    overwrites them by strictly beating ``bt0``.  ``gid_offset`` shifts the
    stored triangle ids into the scene-global index space (tris come after
    the ``P+S+Q`` non-tri primitives)."""
    ivx = 1.0 / jnp.where(jnp.abs(dx) > 1e-12, dx, 1e-12)
    ivy = 1.0 / jnp.where(jnp.abs(dy) > 1e-12, dy, 1e-12)
    ivz = 1.0 / jnp.where(jnp.abs(dz) > 1e-12, dz, 1e-12)

    pgx = jnp.sum(jnp.where(dx > 0, 1.0, -1.0)) >= 0.0
    pgy = jnp.sum(jnp.where(dy > 0, 1.0, -1.0)) >= 0.0
    pgz = jnp.sum(jnp.where(dz > 0, 1.0, -1.0)) >= 0.0

    def pg_of(axis):
        return jnp.where(axis == 0, pgx, jnp.where(axis == 1, pgy, pgz))

    stack_ref[0] = start_node

    def cond(carry):
        step, sp, *_ = carry
        return (sp > 0) & (step < m4 + 2)

    def body(carry):
        step, sp, *best = carry
        best = tuple(best)
        sp = sp - 1
        node = stack_ref[sp]
        b, hits, anyc, metas = _quad_pop_common(
            tree_ref, node, ox, oy, oz, ivx, ivy, ivz, t_min, best[0]
        )

        for c in range(4):
            def leaf_fn(args, base_f=metas[c], bh=hits[c]):
                if featm is not None:
                    return _leaf_closest_mxu(
                        leafmat_ref, featm, base_f, leaf_size, t_min,
                        bh, args, with_attrs, gid_offset,
                    )

                def upd(carry2, win, t, gid, u, v, n3):
                    cur = carry2 if carry2 is not None else args
                    w = win & bh & (t < cur[0])
                    g = gid.astype(jnp.int32)
                    if gid_offset:
                        g = g + gid_offset
                    out = (
                        jnp.where(w, t, cur[0]),
                        jnp.where(w, g, cur[1]),
                    )
                    if with_attrs:
                        out = out + (
                            jnp.where(w, u, cur[2]),
                            jnp.where(w, v, cur[3]),
                            jnp.where(w, n3[0], cur[4]),
                            jnp.where(w, n3[1], cur[5]),
                            jnp.where(w, n3[2], cur[6]),
                        )
                    return out

                return _leaf_tris(
                    slot_ref, base_f.astype(jnp.int32), leaf_size,
                    ox, oy, oz, dx, dy, dz, t_min, upd,
                )

            best = jax.lax.cond(
                anyc[c] & (metas[c] >= 0.0), leaf_fn, lambda a: a, best
            )

        for meta_k, any_k in _quad_push_order(tree_ref, b, metas, anyc, pg_of):
            want = any_k & (meta_k < 0.0)
            child = (-meta_k).astype(jnp.int32) - 1

            @pl.when(want)
            def _(child=child, sp=sp):
                stack_ref[sp] = child

            sp = jnp.where(want, sp + 1, sp)
        return (step + 1, sp) + best

    best0 = (bt0, bi0)
    if with_attrs:
        if attrs0 is None:
            zero = jnp.zeros_like(bt0)
            attrs0 = (zero, zero, zero, jnp.ones_like(bt0), zero)
        best0 = best0 + tuple(attrs0)
    out = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)) + best0)
    return out[2:]


def _bvh4_closest_kernel(
    m4, leaf_size, t_min, t_max,
    tree_ref, slot_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    bt_ref, bi_ref, stack_ref,
):
    """Whole-tree BVH4 closest-hit walk (see ``_bvh4_walk``)."""
    ox = ox_ref[:]
    best_t, best_i = _bvh4_walk(
        m4, leaf_size, t_min, tree_ref, slot_ref, stack_ref, jnp.int32(0),
        ox, oy_ref[:], oz_ref[:], dx_ref[:], dy_ref[:], dz_ref[:],
        jnp.full_like(ox, t_max), jnp.full(ox.shape, -1, jnp.int32),
    )
    bt_ref[:] = best_t
    bi_ref[:] = best_i


def _bvh4_closest_attrs_kernel(
    m4, leaf_size, t_min, t_max,
    tree_ref, slot_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    bt_ref, bi_ref, bu_ref, bv_ref, nx_ref, ny_ref, nz_ref, stack_ref,
):
    """Whole-tree BVH4 closest-hit walk that also emits the winning slot's
    barycentric (u, v) and stored normal — the hit record needs no
    post-kernel triangle gathers (see ``_bvh4_walk(with_attrs=True)``)."""
    ox = ox_ref[:]
    bt, bi, bu, bv, nx, ny, nz = _bvh4_walk(
        m4, leaf_size, t_min, tree_ref, slot_ref, stack_ref, jnp.int32(0),
        ox, oy_ref[:], oz_ref[:], dx_ref[:], dy_ref[:], dz_ref[:],
        jnp.full_like(ox, t_max), jnp.full(ox.shape, -1, jnp.int32),
        with_attrs=True,
    )
    bt_ref[:] = bt
    bi_ref[:] = bi
    bu_ref[:] = bu
    bv_ref[:] = bv
    nx_ref[:] = nx
    ny_ref[:] = ny
    nz_ref[:] = nz


def _bvh4_closest_attrs_mxu_kernel(
    m4, leaf_size, t_min, t_max,
    tree_ref, slot_ref, leafmat_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, featm_ref,
    bt_ref, bi_ref, bu_ref, bv_ref, nx_ref, ny_ref, nz_ref, stack_ref,
):
    """BVH4 closest+attrs walk with MXU leaf visits (``_leaf_closest_mxu``)."""
    ox = ox_ref[:]
    bt, bi, bu, bv, nx, ny, nz = _bvh4_walk(
        m4, leaf_size, t_min, tree_ref, slot_ref, stack_ref, jnp.int32(0),
        ox, oy_ref[:], oz_ref[:], dx_ref[:], dy_ref[:], dz_ref[:],
        jnp.full_like(ox, t_max), jnp.full(ox.shape, -1, jnp.int32),
        with_attrs=True, featm=featm_ref[:], leafmat_ref=leafmat_ref,
    )
    bt_ref[:] = bt
    bi_ref[:] = bi
    bu_ref[:] = bu
    bv_ref[:] = bv
    nx_ref[:] = nx
    ny_ref[:] = ny
    nz_ref[:] = nz


def _bvh4_scene_closest_mxu_kernel(
    m4, leaf_size, ps_layout, gid_offset, t_min, t_max,
    tree_ref, slot_ref, ps_ref, leafmat_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, featm_ref,
    bt_ref, bi_ref, bu_ref, bv_ref, nx_ref, ny_ref, nz_ref, stack_ref,
):
    """Whole-scene closest hit with MXU leaf visits (see
    ``_bvh4_scene_closest_kernel`` for the seeding/flip semantics)."""
    from .intersect_pallas import _sweep_prims

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ps_t, ps_i, ps_nx, ps_ny, ps_nz, ps_u, ps_v = _sweep_prims(
        ps_ref, ps_layout, ox, oy, oz, dx, dy, dz, t_min, t_max,
        want_attrs=True,
    )
    bt, bi, bu, bv, nx, ny, nz = _bvh4_walk(
        m4, leaf_size, t_min, tree_ref, slot_ref, stack_ref, jnp.int32(0),
        ox, oy, oz, dx, dy, dz, ps_t, ps_i,
        with_attrs=True, attrs0=(ps_u, ps_v, ps_nx, ps_ny, ps_nz),
        gid_offset=gid_offset, featm=featm_ref[:], leafmat_ref=leafmat_ref,
    )
    is_tri = bi >= gid_offset
    flip = is_tri & (nx * dx + ny * dy + nz * dz > 0.0)
    sgn = jnp.where(flip, -1.0, 1.0)
    bt_ref[:] = bt
    bi_ref[:] = bi
    bu_ref[:] = bu
    bv_ref[:] = bv
    nx_ref[:] = nx * sgn
    ny_ref[:] = ny * sgn
    nz_ref[:] = nz * sgn


def _bvh4_closest_rooted_kernel(
    m4, leaf_size, t_min,
    tree_ref, slot_ref, root_ref, ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref, en_ref, bt0_ref, bi0_ref,
    bt_ref, bi_ref, stack_ref,
):
    """One multipass traversal pass: walk ONLY the subtree rooted at this
    block's ``root_ref[program_id]`` with carried (best_t, best_i).  Lanes
    with ``en == 0`` (their wanted subtree differs from the block root) walk
    with ``best_t = -1`` so every box/leaf test fails, and their carried
    state passes through untouched."""
    ox = ox_ref[:]
    en = en_ref[:] > 0.5
    bt0, bi0 = bt0_ref[:], bi0_ref[:]
    best_t, best_i = _bvh4_walk(
        m4, leaf_size, t_min, tree_ref, slot_ref, stack_ref,
        root_ref[pl.program_id(0)],
        ox, oy_ref[:], oz_ref[:], dx_ref[:], dy_ref[:], dz_ref[:],
        jnp.where(en, bt0, jnp.float32(-1.0)), bi0,
    )
    bt_ref[:] = jnp.where(en, best_t, bt0)
    bi_ref[:] = jnp.where(en, best_i, bi0)


def _bvh4_scene_closest_kernel(
    m4, leaf_size, ps_layout, gid_offset, t_min, t_max,
    tree_ref, slot_ref, ps_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    bt_ref, bi_ref, bu_ref, bv_ref, nx_ref, ny_ref, nz_ref, stack_ref,
):
    """Whole-SCENE closest hit in ONE kernel: the plane/sphere/quad sweep
    over the SMEM scene blob (``intersect_pallas._sweep_prims``) seeds the
    BVH4 attrs walk's per-lane best, so (a) triangles behind a ps winner are
    pruned by the walk's ``best_t`` bound and (b) the final winner's
    attributes come out merged — killing the XLA broadcast ps sweep, the
    tri-vs-ps combine, and the winner-attribute select epilogue that made
    mesh-scene ``scene_hit`` 58.6 vs the raw kernel's ~40 ns/lane
    (BENCHMARKS.md round 3).

    Outputs: global prim index (ps order first, triangles at
    ``gid_offset``+local), final shading normal (quads/tris flipped toward
    the ray, planes raw, spheres geometric — identical rules to
    ``intersect.scene_hit``), and uv = the ps winner's surface uv or the
    triangle winner's RAW barycentrics (the caller interpolates per-tri uv
    only for textured scenes, exactly as the attrs path does)."""
    from .intersect_pallas import _sweep_prims

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ps_t, ps_i, ps_nx, ps_ny, ps_nz, ps_u, ps_v = _sweep_prims(
        ps_ref, ps_layout, ox, oy, oz, dx, dy, dz, t_min, t_max,
        want_attrs=True,
    )
    bt, bi, bu, bv, nx, ny, nz = _bvh4_walk(
        m4, leaf_size, t_min, tree_ref, slot_ref, stack_ref, jnp.int32(0),
        ox, oy, oz, dx, dy, dz, ps_t, ps_i,
        with_attrs=True, attrs0=(ps_u, ps_v, ps_nx, ps_ny, ps_nz),
        gid_offset=gid_offset,
    )
    # slot normals are stored unflipped; apply scene_hit's toward-the-ray
    # flip to TRIANGLE winners only (the sweep already flipped quads and
    # left planes raw).  `-n` == `n * -1.0` bit-exactly in IEEE f32.
    is_tri = bi >= gid_offset
    flip = is_tri & (nx * dx + ny * dy + nz * dz > 0.0)
    sgn = jnp.where(flip, -1.0, 1.0)
    bt_ref[:] = bt
    bi_ref[:] = bi
    bu_ref[:] = bu
    bv_ref[:] = bv
    nx_ref[:] = nx * sgn
    ny_ref[:] = ny * sgn
    nz_ref[:] = nz * sgn


def _bvh4_any_walk(m4, leaf_size, t_min, tree_ref, slot_ref, stack_ref,
                   ox, oy, oz, dx, dy, dz, limit, found0,
                   featm=None, leafmat_ref=None):
    """BVH4 occlusion walk body: packed dual reductions + near-first order
    so occluded lanes park early and the all-found exit fires sooner.
    ``found0`` seeds the parked/found state (1.0 = already occluded /
    don't-care).  With ``featm``/``leafmat_ref`` the leaf visits run on the
    MXU (``_leaf_any_mxu``) instead of the serial slot tests."""
    ivx = 1.0 / jnp.where(jnp.abs(dx) > 1e-12, dx, 1e-12)
    ivy = 1.0 / jnp.where(jnp.abs(dy) > 1e-12, dy, 1e-12)
    ivz = 1.0 / jnp.where(jnp.abs(dz) > 1e-12, dz, 1e-12)

    pgx = jnp.sum(jnp.where(dx > 0, 1.0, -1.0)) >= 0.0
    pgy = jnp.sum(jnp.where(dy > 0, 1.0, -1.0)) >= 0.0
    pgz = jnp.sum(jnp.where(dz > 0, 1.0, -1.0)) >= 0.0

    def pg_of(axis):
        return jnp.where(axis == 0, pgx, jnp.where(axis == 1, pgy, pgz))

    stack_ref[0] = jnp.int32(0)

    def cond(carry):
        step, sp, found = carry
        return (step < m4 + 2) & (sp > 0) & (jnp.min(found) < 0.5)

    def body(carry):
        step, sp, found = carry
        sp = sp - 1
        node = stack_ref[sp]
        far = jnp.where(found > 0.5, jnp.float32(-1.0), limit)
        b, hits, anyc, metas = _quad_pop_common(
            tree_ref, node, ox, oy, oz, ivx, ivy, ivz, t_min, far
        )

        for c in range(4):
            def leaf_fn(fnd, base_f=metas[c], bh=hits[c]):
                if featm is not None:
                    return _leaf_any_mxu(
                        leafmat_ref, featm, base_f, leaf_size, t_min, bh, fnd
                    )

                def upd(carry2, win, t, _gid, *_attrs):
                    f = carry2 if carry2 is not None else fnd
                    hit_now = win & bh & (t < limit)
                    return jnp.maximum(f, hit_now.astype(jnp.float32))

                return _leaf_tris(
                    slot_ref, base_f.astype(jnp.int32), leaf_size,
                    ox, oy, oz, dx, dy, dz, t_min, upd,
                )

            found = jax.lax.cond(
                anyc[c] & (metas[c] >= 0.0), leaf_fn, lambda f: f, found
            )

        for meta_k, any_k in _quad_push_order(tree_ref, b, metas, anyc, pg_of):
            want = any_k & (meta_k < 0.0)
            child = (-meta_k).astype(jnp.int32) - 1

            @pl.when(want)
            def _(child=child, sp=sp):
                stack_ref[sp] = child

            sp = jnp.where(want, sp + 1, sp)
        return step + 1, sp, found

    init = (jnp.int32(0), jnp.int32(1), found0)
    _s, _sp, found = jax.lax.while_loop(cond, body, init)
    return found


def _bvh4_any_kernel(
    m4, leaf_size, t_min,
    tree_ref, slot_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    limit_ref, found_ref, stack_ref,
):
    """Whole-tree BVH4 occlusion walk (see ``_bvh4_any_walk``)."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    limit = limit_ref[:]
    # lanes whose limit is <= 0 (callers pass -1 for don't-care lanes, e.g.
    # NEE shadow rays of lanes that missed the scene) start pre-found: they
    # add no walk work and count toward the all-found early exit.  Their
    # reported occlusion is True ("don't care"); callers mask it.
    found_ref[:] = _bvh4_any_walk(
        m4, leaf_size, t_min, tree_ref, slot_ref, stack_ref,
        ox, oy, oz, dx, dy, dz, limit,
        (limit <= 0.0).astype(jnp.float32),
    )


def _bvh4_any_mxu_kernel(
    m4, leaf_size, t_min,
    tree_ref, slot_ref, leafmat_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    limit_ref, featm_ref, found_ref, stack_ref,
):
    """Whole-tree BVH4 occlusion walk with MXU leaf visits (see
    ``_leaf_any_mxu``)."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    limit = limit_ref[:]
    found_ref[:] = _bvh4_any_walk(
        m4, leaf_size, t_min, tree_ref, slot_ref, stack_ref,
        ox, oy, oz, dx, dy, dz, limit,
        (limit <= 0.0).astype(jnp.float32),
        featm=featm_ref[:], leafmat_ref=leafmat_ref,
    )


def _bvh4_scene_any_mxu_kernel(
    m4, leaf_size, ps_layout, t_min,
    tree_ref, slot_ref, ps_ref, leafmat_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    limit_ref, featm_ref, found_ref, stack_ref,
):
    """Whole-scene occlusion with MXU leaf visits: ps sweep seeds found,
    triangles via ``_leaf_any_mxu`` (see ``_bvh4_scene_any_kernel``)."""
    from .intersect_pallas import _sweep_prims

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    limit = limit_ref[:]
    _t, ps_i, *_ = _sweep_prims(
        ps_ref, ps_layout, ox, oy, oz, dx, dy, dz, t_min, limit,
        want_attrs=False,
    )
    found0 = jnp.maximum(
        (limit <= 0.0).astype(jnp.float32), (ps_i >= 0).astype(jnp.float32)
    )
    found_ref[:] = _bvh4_any_walk(
        m4, leaf_size, t_min, tree_ref, slot_ref, stack_ref,
        ox, oy, oz, dx, dy, dz, limit, found0,
        featm=featm_ref[:], leafmat_ref=leafmat_ref,
    )


def _bvh4_scene_any_kernel(
    m4, leaf_size, ps_layout, t_min,
    tree_ref, slot_ref, ps_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    limit_ref, found_ref, stack_ref,
):
    """Whole-SCENE occlusion in one kernel: the plane/sphere/quad sweep over
    the SMEM scene blob (``intersect_pallas._sweep_prims``) seeds the BVH4
    any-walk's found state, so ps-occluded lanes park before the tree walk
    starts and no XLA combine runs afterwards."""
    from .intersect_pallas import _sweep_prims

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    limit = limit_ref[:]
    # per-lane bound = limit reproduces the XLA candidates' strict-< test;
    # don't-care lanes (limit <= 0) can never satisfy t < limit here, so
    # they are seeded found by the explicit limit term exactly as in
    # _bvh4_any_kernel
    _t, ps_i, *_ = _sweep_prims(
        ps_ref, ps_layout, ox, oy, oz, dx, dy, dz, t_min, limit,
        want_attrs=False,
    )
    found0 = jnp.maximum(
        (limit <= 0.0).astype(jnp.float32), (ps_i >= 0).astype(jnp.float32)
    )
    found_ref[:] = _bvh4_any_walk(
        m4, leaf_size, t_min, tree_ref, slot_ref, stack_ref,
        ox, oy, oz, dx, dy, dz, limit, found0,
    )


def _blocks(n):
    rows = n // LANES
    block_rows = min(TRAV_ROWS, rows)
    while rows % block_rows:
        block_rows //= 2
    return rows, block_rows


# ---- ray binning ------------------------------------------------------------
#
# Block-synchronous traversal lives or dies by intra-block coherence: an
# incoherent 4096-ray block visits ~80% of the tree (measured 5287/7087 steps
# on the 11.5K-tri mesh scene), because one step is skipped only when NO lane
# hits the node's box.  Per-lane gathers that a SIMT walk would use cost
# ~8 ns/element here, but ``lax.sort`` is pure vector work: an 8-operand sort
# of 131K lanes measures 0.15 ms vs 6.6 ms for the equivalent gathers.  So
# rays are sorted into (direction-octant, origin-morton) bins before the walk
# and the results are unsorted by a second (index-keyed) sort.  Octant-major
# beat morton-major 10.8 vs 5.0 Mrays/s on hemisphere-distributed bounce rays
# (steps 5287 → 1983); see experiments/measure_bvh2.py.
#
# Correctness: traversal is per-lane exact — visit order is the same DFS
# preorder for every block, a lane accepts a leaf hit only by its own
# Möller–Trumbore + best_t tests, and nodes skipped by the block are nodes
# the lane's own slab test failed.  Sorting therefore changes *which* nodes
# are visited (a superset/subset per lane) but never a lane's result:
# sorted == unsorted bit-exactly (tested).
BVH_SORT = True
_SORT_MIN_ROWS = 16  # below two blocks there is nothing to bin
_MORTON_BITS = 4
# front-to-back stack walk for closest-hit (A/B flag; see
# _bvh_closest_ordered_kernel).  Falls back to the skip-link preorder walk
# when the tree is deeper than the SMEM stack.
BVH_ORDERED = True
# BVH4 walk (two collapsed levels, packed dual-count reductions; see
# _bvh4_closest_kernel).  Preferred over the BVH2 walks when the quad blob
# exists and the stack fits; A/B flag for parity tests and measurement.
BVH_QUAD = True
# primary-subtree-major sort key (see _subtree_key); A/B flag
BVH_SUBKEY = True
# subtree-key depth: 1 = root's 4 children (4 slab tests, no dynamic
# slices), 2 = 16 grandchildren (20 slab tests + 4 dynamic slices).  The
# sim says depth 2 saves only ~10% more walk (145 vs 155 pops/block) while
# its key costs ~4x more to compute; measured on v5e the cheaper key nets
# more (experiments/measure_bvh8.py).
BVH_SUBKEY_DEPTH = 1
# multipass closest-hit traversal: ONE upfront sort by (first-subtree,
# second-subtree, octant|morton), then pass k walks only each block's
# majority depth-2 subtree with best_t carried, then a cleanup walk from the
# global root makes the result exact regardless of the predictions.  The
# walk-simulation (experiments/sim_mp2.py, 11.5K-tri mesh, incoherent rays,
# 1024-lane blocks): pops 2572 → 2010 and leaf visits 3327 → 3001 vs the
# single-sort subtree key, for one extra sort operand and two extra kernel
# launches.  Measured on v5e (experiments/measure_mp.py): the pop savings
# mostly cancel against the key/sort/launch overhead — kernel +5% (31.0 vs
# 29.6 Mrays/s incoherent closest), config-5 end-to-end flat (19.04 vs
# 19.16).  Default OFF: +5% does not buy three Mosaic compiles per shape on
# this tunnel.  Exactness is by construction (cleanup bounds by best_t) and
# tested against the single-pass walk.
BVH_MULTIPASS = False
_MP_MIN_DEPTH4 = 4  # shallow quad trees: subtree split cannot pay
# closest walk emits (u, v, stored normal) from SMEM so scene_hit skips its
# post-kernel triangle gathers (see bvh_closest_attrs_pallas).  Env escape
# hatch PTRT_BVH_ATTRS=0 exists because the kernel was interpret-verified
# during a hardware outage; flip it off if the real Mosaic toolchain
# rejects the 7-output carry without editing code.
BVH_ATTRS = os.environ.get("PTRT_BVH_ATTRS", "1") != "0"
# fused whole-scene kernels: sweep the plane/sphere/quad blob inside the
# BVH4 walk kernel, eliminating the XLA ps sweep + combine + attr epilogue
# around mesh-scene scene_hit/scene_hit_any.  Builds on the attrs walk
# (implies BVH_ATTRS semantics); same interpret-verified escape-hatch
# pattern: PTRT_BVH_SCENE=0 reverts to the split path without code edits.
BVH_SCENE = os.environ.get("PTRT_BVH_SCENE", "1") != "0"
# MXU leaf visits (``_leaf_any_mxu`` / ``_leaf_closest_mxu``): one matmul
# against the ``pack_leaf_mat`` coefficient table replaces the 16 serial
# Möller–Trumbore slot tests — the leaf test is the measured majority of
# the BVH4 walk.  Decision-equivalent to the scalar path up to f32 rounding
# of the linear forms (edge-boundary rays may flip, measure-zero).
# MEASURED LOSS on v5e (the sixth negative, BENCHMARKS.md): any-walk kernel
# 12.74 vs 5.59 ms (0.44×), config-5 e2e 5.8 vs 3.1 s (0.53×), exact match
# 1.0 both levels — the per-visit (128, W) matmul sits on the walk's serial
# critical path (its latency can't pipeline against anything) and its
# result roundtrips VMEM every visit, which costs more than the 16
# ILP-rich VPU slot tests it replaces.  Kept gated off; env hatch
# PTRT_BVH_MXU_LEAF=0/1.
BVH_MXU_LEAF = os.environ.get("PTRT_BVH_MXU_LEAF", "0") != "0"
# the leaf coefficient table is a VMEM operand: (16, G·128) f32 = 8 KB per
# 16-triangle leaf group.  Budget well under the ~16 MB VMEM so the ray
# blocks, (128, W) matmul result and double buffering still fit.
LEAF_MAT_VMEM_BYTES = 9_000_000


def _mxu_leaf_ok(bvh) -> bool:
    return (
        BVH_MXU_LEAF
        and getattr(bvh, "leaf_mat", None) is not None
        and int(bvh.leaf_mat.size) * 4 <= LEAF_MAT_VMEM_BYTES
    )


def _feat_matrix(ro: V3, rd: V3, limit_v) -> jnp.ndarray:
    """(16, n) ray-feature matrix for the MXU leaf test: rows
    [d, m=o×d, o, 1, limit, 0…] in ``pack_leaf_mat``'s feature order."""
    m = ro.cross(rd)
    one = jnp.ones_like(ro.x)
    zero = jnp.zeros_like(ro.x)
    lim = jnp.broadcast_to(jnp.asarray(limit_v, jnp.float32), ro.x.shape)
    return jnp.stack([
        rd.x, rd.y, rd.z, m.x, m.y, m.z, ro.x, ro.y, ro.z, one, lim,
        zero, zero, zero, zero, zero,
    ])


def _scene_fused_ok(cs) -> bool:
    """The fused scene kernels need the BVH4 attrs walk, a nonempty
    plane/sphere/quad table that fits the sweep's SMEM budget, and combined
    blob headroom."""
    from .intersect_pallas import SMEM_PRIM_LIMIT, ps_blob_layout

    bvh = cs.bvh
    if not (BVH_SCENE and BVH_ATTRS and bvh is not None and _quad_ok(bvh)):
        return False
    psq = cs.n_planes + cs.n_spheres + cs.n_quads
    if not (0 < psq <= SMEM_PRIM_LIMIT):
        return False
    layout = ps_blob_layout(cs)
    return (
        int(bvh.quad_blob.shape[1]) + int(bvh.slot_blob.shape[1])
        + layout.size <= SMEM_BLOB_LIMIT
    )


def _slab_key(lo3, hi3, ro: V3, rd: V3, far=None) -> jnp.ndarray:
    """Vectorized slab test of one (traced-scalar) box against all rays —
    the key-computation counterpart of the kernel's ``_slab``.  ``far`` is
    an optional per-ray upper bound (multipass passes best_t)."""
    enter = jnp.full_like(ro.x, 1e-3)
    exit_ = (jnp.full_like(ro.x, 1e6) if far is None
             else jnp.asarray(far, jnp.float32))
    for lo_c, hi_c, o, d in ((lo3[0], hi3[0], ro.x, rd.x),
                             (lo3[1], hi3[1], ro.y, rd.y),
                             (lo3[2], hi3[2], ro.z, rd.z)):
        iv = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, 1e-12)
        a = (lo_c - o) * iv
        b = (hi_c - o) * iv
        enter = jnp.maximum(enter, jnp.minimum(a, b))
        exit_ = jnp.minimum(exit_, jnp.maximum(a, b))
    return enter <= exit_


def _child_ranks(rec, rd: V3):
    """Per-ray visit rank (0..3) of each child of one BVH4 node, in the
    ray's own near-first order (mirrors ``_quad_push_order``).  ``rec`` is a
    (32,)-slice of the quad blob (traced scalars)."""
    def nf(k_f):
        k = k_f.astype(jnp.int32)
        axis = jnp.remainder(k, 4)
        flip = (k // 4) > 0
        pos = jnp.where(
            axis == 0, rd.x > 0, jnp.where(axis == 1, rd.y > 0, rd.z > 0)
        )
        return jnp.logical_xor(pos, flip)

    p0n, c0n, c2n = nf(rec[28]), nf(rec[29]), nf(rec[30])
    one = jnp.int32(1)
    two = jnp.int32(2)
    pair0 = jnp.where(p0n, 0, two)  # visit rank of pair (0,1)
    pair1 = jnp.where(p0n, two, 0)
    return (
        pair0 + jnp.where(c0n, 0, one),
        pair0 + jnp.where(c0n, one, 0),
        pair1 + jnp.where(c2n, 0, one),
        pair1 + jnp.where(c2n, one, 0),
    )


def _first_child(rec, ro: V3, rd: V3):
    """Per-ray first child (in the ray's near-first visit order, mirroring
    ``_quad_push_order``) of one BVH4 node whose box the ray enters.
    ``rec`` is a (32,)-slice of the quad blob (traced scalars).  Returns
    ``(chosen 0..3 int32, none bool)``."""
    hits = [
        _slab_key(rec[6 * c : 6 * c + 3], rec[6 * c + 3 : 6 * c + 6], ro, rd)
        for c in range(4)
    ]
    ranks = _child_ranks(rec, rd)
    # first entered = min visit rank among hit children (miss → rank 4+c)
    best_rank = jnp.full_like(ranks[0], 8)
    chosen = jnp.zeros_like(ranks[0])
    for c in range(4):
        r = jnp.where(hits[c], ranks[c], 8)
        take = r < best_rank
        best_rank = jnp.where(take, r, best_rank)
        chosen = jnp.where(take, jnp.int32(c), chosen)
    return chosen, best_rank >= 8


def _subtree_key(bvh, ro: V3, rd: V3) -> jnp.ndarray:
    """Primary-subtree id (0..16) — which depth-2 BVH4 subtree the ray
    enters FIRST in its own near-first order.  Used as the major sort key:
    rays that will immediately descend into the same subtree share a block,
    so the block-``any`` culling prunes the other subtrees.  Simulated on
    the 11.5K-tri mesh (experiments/sim_traversal.py): pops 257→145 and
    leaf visits 356→225 per incoherent 4096-ray block vs the plain
    octant+morton key."""
    qb = bvh.quad_blob
    root = [qb[0, k] for k in range(_NODE4_F)]
    c0, none0 = _first_child(root, ro, rd)
    if BVH_SUBKEY_DEPTH < 2:
        return jnp.where(none0, jnp.int32(4), c0)
    sub = jnp.zeros_like(c0)
    for c in range(4):
        meta = qb[0, 24 + c]
        j = jnp.maximum((-meta).astype(jnp.int32) - 1, 0)
        rec_d = jax.lax.dynamic_slice(qb, (jnp.int32(0), j * _NODE4_F),
                                      (1, _NODE4_F))
        rec = [rec_d[0, k] for k in range(_NODE4_F)]
        c1, _none1 = _first_child(rec, ro, rd)
        c1 = jnp.where(meta >= 0.0, 0, c1)  # leaf child: no second level
        sub = jnp.where(c0 == c, jnp.int32(4 * c) + c1, sub)
    return jnp.where(none0, jnp.int32(16), sub)


def _subtree_nodes(qb):
    """Traced ``((16,) int32 node ids, (16,) bool valid)`` of the depth-2
    BVH4 subtrees (root's grandchildren) in ``c0*4 + c1`` order.  Invalid
    where the slot is empty or the depth-1/2 child is a leaf (those lanes
    are handled entirely by the cleanup pass)."""
    ids, valid = [], []
    for c0 in range(4):
        meta0 = qb[0, 24 + c0]
        j = jnp.maximum((-meta0).astype(jnp.int32) - 1, 0)
        rec = jax.lax.dynamic_slice(qb, (jnp.int32(0), j * _NODE4_F),
                                    (1, _NODE4_F))
        inner0 = (meta0 < 0.0) & (j >= 1)
        for c1 in range(4):
            meta1 = rec[0, 24 + c1]
            node1 = (-meta1).astype(jnp.int32) - 1
            ids.append(jnp.maximum(node1, 0))
            valid.append(inner0 & (meta1 < 0.0) & (node1 >= 1))
    return jnp.stack(ids), jnp.stack(valid)


def _subtree_keys2(bvh, ro: V3, rd: V3):
    """Per-ray (first, second) depth-2 subtree ids (0..15, 16 = none) in the
    ray's own near-first visit order — the two major sort keys of the
    multipass traversal.  Purely a scheduling heuristic: a wrong prediction
    only shifts work into the cleanup pass, never changes results."""
    qb = bvh.quad_blob
    root = [qb[0, k] for k in range(_NODE4_F)]
    hits0 = [
        _slab_key(root[6 * c : 6 * c + 3], root[6 * c + 3 : 6 * c + 6], ro, rd)
        for c in range(4)
    ]
    ranks0 = _child_ranks(root, rd)

    big = jnp.int32(99)
    rank16 = []
    for c0 in range(4):
        meta0 = root[24 + c0]
        j = jnp.maximum((-meta0).astype(jnp.int32) - 1, 0)
        rec_d = jax.lax.dynamic_slice(qb, (jnp.int32(0), j * _NODE4_F),
                                      (1, _NODE4_F))
        rec = [rec_d[0, k] for k in range(_NODE4_F)]
        inner0 = meta0 < 0.0  # traced scalar; broadcasts over lanes
        hits1 = [
            _slab_key(rec[6 * c : 6 * c + 3], rec[6 * c + 3 : 6 * c + 6], ro, rd)
            for c in range(4)
        ]
        ranks1 = _child_ranks(rec, rd)
        for c1 in range(4):
            # leaf child c0: one unit at (c0, 0), box = the child's own box
            hit = jnp.where(inner0, hits0[c0] & hits1[c1],
                            hits0[c0] & (c1 == 0))
            rank = ranks0[c0] * 4 + jnp.where(inner0, ranks1[c1], 0)
            rank16.append(jnp.where(hit, rank, big))

    def argmin16(ranks, exclude=None):
        best = jnp.full_like(ranks[0], 99)
        arg = jnp.full_like(ranks[0], 16)
        for k in range(16):
            r = ranks[k] if exclude is None else jnp.where(
                exclude == k, big, ranks[k])
            take = r < best
            best = jnp.where(take, r, best)
            arg = jnp.where(take, jnp.int32(k), arg)
        return arg

    s1 = argmin16(rank16)
    s2 = argmin16(rank16, exclude=s1)
    return s1, s2


def _base_key(bvh, ro: V3, rd: V3) -> jnp.ndarray:
    """(direction octant << 3B) | origin-morton coherence key — the
    subtree-independent part of ``_sort_key``, also the minor key of every
    multipass sort."""
    B = _MORTON_BITS
    lo = bvh.tree_blob[0, 0:3]
    hi = bvh.tree_blob[0, 3:6]
    scale = (2.0**B - 1e-3) / jnp.maximum(hi - lo, 1e-30)

    def cell(x, k):
        return jnp.clip((x - lo[k]) * scale[k], 0.0, 2.0**B - 1.0).astype(jnp.int32)

    def spread(v):
        r = jnp.zeros_like(v)
        for b in range(B):
            r = r | (((v >> b) & 1) << (3 * b))
        return r

    morton = (
        (spread(cell(ro.x, 0)) << 2)
        | (spread(cell(ro.y, 1)) << 1)
        | spread(cell(ro.z, 2))
    )
    octant = (
        ((rd.x > 0).astype(jnp.int32) << 2)
        | ((rd.y > 0).astype(jnp.int32) << 1)
        | (rd.z > 0).astype(jnp.int32)
    )
    return (octant << (3 * B)) | morton


def _sort_key(bvh, ro: V3, rd: V3) -> jnp.ndarray:
    """Traversal-coherence key: primary depth-2 subtree (major, BVH4 path
    only — see ``_subtree_key``), then 3 direction-sign bits, then a
    ``_MORTON_BITS``-per-axis morton code of the origin inside the root
    box."""
    key = _base_key(bvh, ro, rd)
    if BVH_SUBKEY and _quad_ok(bvh):
        key = key | (_subtree_key(bvh, ro, rd) << (3 + 3 * _MORTON_BITS))
    return key


def _sort_enabled(n: int) -> bool:
    return BVH_SORT and (n // LANES) >= _SORT_MIN_ROWS


def _mp_ok(bvh, n: int) -> bool:
    return (
        BVH_MULTIPASS
        and BVH_SORT
        and _quad_ok(bvh)
        and (n // LANES) >= _SORT_MIN_ROWS
        and int(bvh.quad_depth_token.shape[0]) >= _MP_MIN_DEPTH4
    )


def _bvh_closest_rooted(bvh, roots, ro: V3, rd: V3, en, bt0, bi0, t_min: float):
    """One multipass pass (or the cleanup pass): per-block subtree roots +
    carried best state through ``_bvh4_closest_rooted_kernel``."""
    n = ro.x.shape[0]
    rows, block_rows = _blocks(n)
    m4 = int(bvh.quad_blob.shape[1]) // _NODE4_F
    leaf_size = int(bvh.slots.shape[1])
    spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    speci = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def rows2(a):
        return a.reshape(rows, LANES)

    bt, bi = pl.pallas_call(
        partial(_bvh4_closest_rooted_kernel, m4, leaf_size, float(t_min)),
        grid=(rows // block_rows,),
        in_specs=[smem, smem, smem] + [spec] * 7 + [spec, speci],
        out_specs=[spec, speci],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((_STACK_CAP,), jnp.int32)],
    )(
        bvh.quad_blob, bvh.slot_blob, roots,
        rows2(ro.x), rows2(ro.y), rows2(ro.z),
        rows2(rd.x), rows2(rd.y), rows2(rd.z),
        rows2(en.astype(jnp.float32)), rows2(bt0), rows2(bi0),
    )
    # decode is idempotent, so re-decoding ids carried from a prior pass is
    # safe (their uid bits are already zero)
    return bt.reshape(n), _decode_gid(bi.reshape(n), _packed(bvh))


def _bvh_closest_multipass(bvh, ro: V3, rd: V3, t_min: float, t_max: float):
    """Multipass sorted closest-hit (see ``BVH_MULTIPASS``)."""
    n = ro.x.shape[0]
    s1, s2 = _subtree_keys2(bvh, ro, rd)
    base = _base_key(bvh, ro, rd)
    B = 3 + 3 * _MORTON_BITS
    key = (s1 << (B + 5)) | (s2 << B) | base
    iota = jnp.arange(n, dtype=jnp.int32)
    _k, ss1, ss2, sx, sy, sz, sdx, sdy, sdz, sidx = jax.lax.sort(
        [key, s1, s2, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, iota],
        num_keys=1, is_stable=True,
    )
    sro, srd = V3(sx, sy, sz), V3(sdx, sdy, sdz)
    rows, block_rows = _blocks(n)
    nblk = rows // block_rows
    bs = block_rows * LANES
    table, valid = _subtree_nodes(bvh.quad_blob)

    bt = jnp.full((n,), t_max, jnp.float32)
    bi = jnp.full((n,), -1, jnp.int32)
    for svec in (ss1, ss2):
        s_first = svec.reshape(nblk, bs)[:, 0]
        sc = jnp.clip(s_first, 0, 15)
        rootv = valid[sc] & (s_first < 16)
        roots = jnp.where(rootv, table[sc], 0)
        en = (svec == jnp.repeat(s_first, bs)) & jnp.repeat(rootv, bs)
        bt, bi = _bvh_closest_rooted(bvh, roots, sro, srd, en, bt, bi, t_min)
    # cleanup from the global root: exact regardless of the predictions
    bt, bi = _bvh_closest_rooted(
        bvh, jnp.zeros((nblk,), jnp.int32), sro, srd,
        jnp.ones((n,), bool), bt, bi, t_min,
    )
    _i, bt, bi = jax.lax.sort([sidx, bt, bi], num_keys=1, is_stable=True)
    return bt, bi


def bvh_closest_attrs_pallas(bvh, ro: V3, rd: V3, t_min: float, t_max: float):
    """``(best_t, best_local_tri_idx, u, v, normal V3)`` over the ray batch —
    the closest walk that also emits the winning triangle's hit attributes
    from SMEM, killing the ~75 ns/lane of post-kernel XLA gathers that
    dominated mesh-scene ``scene_hit`` (measured, BENCHMARKS.md round 3).
    Returns ``None`` when the BVH4 blob is unavailable (caller falls back to
    ``bvh_closest_pallas`` + gathers).  Attrs are only meaningful where
    ``best_i >= 0``; the normal is the triangle's STORED unit normal
    (bit-identical to ``triangles.normal``), unflipped.
    """
    if not (BVH_ATTRS and _quad_ok(bvh)):
        return None
    n = ro.x.shape[0]

    def run(o, d):
        rows, block_rows = _blocks(n)
        m4 = int(bvh.quad_blob.shape[1]) // _NODE4_F
        leaf_size = int(bvh.slots.shape[1])
        spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)

        def rows2(a):
            return a.reshape(rows, LANES)

        f32 = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
        i32 = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
        if _mxu_leaf_ok(bvh):
            featm = _feat_matrix(o, d, 0.0)
            fspec = pl.BlockSpec((16, block_rows * LANES), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
            vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
            outs = pl.pallas_call(
                partial(_bvh4_closest_attrs_mxu_kernel, m4, leaf_size,
                        float(t_min), float(t_max)),
                grid=(rows // block_rows,),
                in_specs=[smem, smem, vmem_full] + [spec] * 6 + [fspec],
                out_specs=[spec] * 7,
                out_shape=[f32, i32, f32, f32, f32, f32, f32],
                scratch_shapes=[pltpu.SMEM((_STACK_CAP,), jnp.int32)],
            )(
                bvh.quad_blob, bvh.slot_blob, bvh.leaf_mat,
                rows2(o.x), rows2(o.y), rows2(o.z),
                rows2(d.x), rows2(d.y), rows2(d.z), featm,
            )
            return tuple(a.reshape(n) for a in outs)
        outs = pl.pallas_call(
            partial(_bvh4_closest_attrs_kernel, m4, leaf_size,
                    float(t_min), float(t_max)),
            grid=(rows // block_rows,),
            in_specs=[smem, smem] + [spec] * 6,
            out_specs=[spec] * 7,
            out_shape=[f32, i32, f32, f32, f32, f32, f32],
            scratch_shapes=[pltpu.SMEM((_STACK_CAP,), jnp.int32)],
        )(
            bvh.quad_blob, bvh.slot_blob,
            rows2(o.x), rows2(o.y), rows2(o.z),
            rows2(d.x), rows2(d.y), rows2(d.z),
        )
        return tuple(a.reshape(n) for a in outs)

    if _sort_enabled(n):
        iota = jnp.arange(n, dtype=jnp.int32)
        _k, sx, sy, sz, sdx, sdy, sdz, sidx = jax.lax.sort(
            [_sort_key(bvh, ro, rd), ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, iota],
            num_keys=1, is_stable=True,
        )
        bt, bi, bu, bv, nx, ny, nz = run(V3(sx, sy, sz), V3(sdx, sdy, sdz))
        _i, bt, bi, bu, bv, nx, ny, nz = jax.lax.sort(
            [sidx, bt, bi, bu, bv, nx, ny, nz], num_keys=1, is_stable=True
        )
    else:
        bt, bi, bu, bv, nx, ny, nz = run(ro, rd)
    return bt, _decode_gid(bi, _packed(bvh)), bu, bv, V3(nx, ny, nz)


def bvh_scene_closest_pallas(cs, ro: V3, rd: V3, t_min: float, t_max: float):
    """``(best_t, global_prim_idx, u, v, normal V3)`` for the WHOLE scene —
    non-tri primitives swept in-kernel from the SMEM scene blob, triangles
    via the seeded BVH4 attrs walk (see ``_bvh4_scene_closest_kernel``).
    Returns ``None`` when the fused path is unavailable (caller falls back
    to the split ps-sweep + attrs-walk path).  For triangle winners ``u, v``
    are the raw barycentrics (caller interpolates texture uv)."""
    if not _scene_fused_ok(cs):
        return None
    from .intersect_pallas import pack_ps_blob, ps_blob_layout

    bvh = cs.bvh
    n = ro.x.shape[0]
    layout = ps_blob_layout(cs)
    ps_blob = pack_ps_blob(cs)
    gid_offset = cs.n_planes + cs.n_spheres + cs.n_quads

    def run(o, d):
        rows, block_rows = _blocks(n)
        m4 = int(bvh.quad_blob.shape[1]) // _NODE4_F
        leaf_size = int(bvh.slots.shape[1])
        spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)

        def rows2(a):
            return a.reshape(rows, LANES)

        f32 = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
        i32 = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
        if _mxu_leaf_ok(bvh):
            featm = _feat_matrix(o, d, 0.0)
            fspec = pl.BlockSpec((16, block_rows * LANES), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
            vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
            outs = pl.pallas_call(
                partial(_bvh4_scene_closest_mxu_kernel, m4, leaf_size, layout,
                        gid_offset, float(t_min), float(t_max)),
                grid=(rows // block_rows,),
                in_specs=[smem, smem, smem, vmem_full] + [spec] * 6 + [fspec],
                out_specs=[spec] * 7,
                out_shape=[f32, i32, f32, f32, f32, f32, f32],
                scratch_shapes=[pltpu.SMEM((_STACK_CAP,), jnp.int32)],
            )(
                bvh.quad_blob, bvh.slot_blob, ps_blob, bvh.leaf_mat,
                rows2(o.x), rows2(o.y), rows2(o.z),
                rows2(d.x), rows2(d.y), rows2(d.z), featm,
            )
            return tuple(a.reshape(n) for a in outs)
        outs = pl.pallas_call(
            partial(_bvh4_scene_closest_kernel, m4, leaf_size, layout,
                    gid_offset, float(t_min), float(t_max)),
            grid=(rows // block_rows,),
            in_specs=[smem, smem, smem] + [spec] * 6,
            out_specs=[spec] * 7,
            out_shape=[f32, i32, f32, f32, f32, f32, f32],
            scratch_shapes=[pltpu.SMEM((_STACK_CAP,), jnp.int32)],
        )(
            bvh.quad_blob, bvh.slot_blob, ps_blob,
            rows2(o.x), rows2(o.y), rows2(o.z),
            rows2(d.x), rows2(d.y), rows2(d.z),
        )
        return tuple(a.reshape(n) for a in outs)

    if _sort_enabled(n):
        iota = jnp.arange(n, dtype=jnp.int32)
        _k, sx, sy, sz, sdx, sdy, sdz, sidx = jax.lax.sort(
            [_sort_key(bvh, ro, rd), ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, iota],
            num_keys=1, is_stable=True,
        )
        bt, bi, bu, bv, nx, ny, nz = run(V3(sx, sy, sz), V3(sdx, sdy, sdz))
        _i, bt, bi, bu, bv, nx, ny, nz = jax.lax.sort(
            [sidx, bt, bi, bu, bv, nx, ny, nz], num_keys=1, is_stable=True
        )
    else:
        bt, bi, bu, bv, nx, ny, nz = run(ro, rd)
    return (bt, _decode_gid(bi, _packed(bvh), gid_offset), bu, bv,
            V3(nx, ny, nz))


def bvh_scene_any_pallas(cs, ro: V3, rd: V3, t_min: float, limit,
                         extra_key=None):
    """Whole-scene occlusion mask with per-lane ``limit`` in one kernel (see
    ``_bvh4_scene_any_kernel``); ``None`` when the fused path is
    unavailable.

    ``extra_key`` (optional per-lane int32, small values) rides ABOVE the
    coherence key as the major sort criterion.  The whole-bounce driver
    passes the NEE light index: shadow rays aiming at the SAME light point
    are maximally direction-coherent, while the octant bits alone split
    them (the 16 light points span a few centimetres, so per-light
    direction spreads are tiny compared to the pick-to-pick spread)."""
    if not _scene_fused_ok(cs):
        return None
    from .intersect_pallas import pack_ps_blob, ps_blob_layout

    bvh = cs.bvh
    n = ro.x.shape[0]
    layout = ps_blob_layout(cs)
    ps_blob = pack_ps_blob(cs)

    def run(o, d, lim):
        rows, block_rows = _blocks(n)
        assert block_rows * LANES < (1 << _PACK_FIELD), "packed counts overflow"
        m4 = int(bvh.quad_blob.shape[1]) // _NODE4_F
        leaf_size = int(bvh.slots.shape[1])
        spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)

        def rows2(a):
            return a.reshape(rows, LANES)

        if _mxu_leaf_ok(bvh):
            featm = _feat_matrix(o, d, lim)
            fspec = pl.BlockSpec((16, block_rows * LANES), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
            vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
            found = pl.pallas_call(
                partial(_bvh4_scene_any_mxu_kernel, m4, leaf_size, layout,
                        float(t_min)),
                grid=(rows // block_rows,),
                in_specs=[smem, smem, smem, vmem_full] + [spec] * 7 + [fspec],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                scratch_shapes=[pltpu.SMEM((_STACK_CAP,), jnp.int32)],
            )(
                bvh.quad_blob, bvh.slot_blob, ps_blob, bvh.leaf_mat,
                rows2(o.x), rows2(o.y), rows2(o.z),
                rows2(d.x), rows2(d.y), rows2(d.z),
                rows2(lim), featm,
            )
            return found.reshape(n)

        found = pl.pallas_call(
            partial(_bvh4_scene_any_kernel, m4, leaf_size, layout,
                    float(t_min)),
            grid=(rows // block_rows,),
            in_specs=[smem, smem, smem] + [spec] * 7,
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            scratch_shapes=[pltpu.SMEM((_STACK_CAP,), jnp.int32)],
        )(
            bvh.quad_blob, bvh.slot_blob, ps_blob,
            rows2(o.x), rows2(o.y), rows2(o.z),
            rows2(d.x), rows2(d.y), rows2(d.z),
            rows2(lim),
        )
        return found.reshape(n)

    limit_v = jnp.broadcast_to(jnp.asarray(limit, jnp.float32), (n,))
    if _sort_enabled(n):
        key = _sort_key(bvh, ro, rd)
        if extra_key is not None:
            # above the subtree bits (subtree ids 0..16 need 5 bits)
            key = key | (extra_key << (8 + 3 * _MORTON_BITS))
        iota = jnp.arange(n, dtype=jnp.int32)
        _k, sx, sy, sz, sdx, sdy, sdz, slim, sidx = jax.lax.sort(
            [key, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z,
             limit_v, iota],
            num_keys=1, is_stable=True,
        )
        found = run(V3(sx, sy, sz), V3(sdx, sdy, sdz), slim)
        _i, found_u = jax.lax.sort([sidx, found], num_keys=1, is_stable=True)
        return found_u > 0.5
    return run(ro, rd, limit_v) > 0.5


def bvh_closest_pallas(bvh, ro: V3, rd: V3, t_min: float, t_max: float):
    """(best_t, best_local_tri_idx) over the ray batch.  ``n % 128 == 0``.

    Rays are coherence-sorted first (see ``_sort_key``); bit-exact either way.
    """
    n = ro.x.shape[0]
    if _mp_ok(bvh, n):
        return _bvh_closest_multipass(bvh, ro, rd, t_min, t_max)
    if _sort_enabled(n):
        iota = jnp.arange(n, dtype=jnp.int32)
        _k, sx, sy, sz, sdx, sdy, sdz, sidx = jax.lax.sort(
            [_sort_key(bvh, ro, rd), ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, iota],
            num_keys=1, is_stable=True,
        )
        bt, bi = _bvh_closest_unsorted(
            bvh, V3(sx, sy, sz), V3(sdx, sdy, sdz), t_min, t_max
        )
        _i, bt, bi = jax.lax.sort([sidx, bt, bi], num_keys=1, is_stable=True)
        return bt, bi
    return _bvh_closest_unsorted(bvh, ro, rd, t_min, t_max)


def _ordered_ok(bvh) -> bool:
    """The front-to-back stack walk needs the depth token and stack headroom
    (depth + 1 live entries, +1 margin)."""
    return (
        BVH_ORDERED
        and getattr(bvh, "depth_token", None) is not None
        and int(bvh.depth_token.shape[0]) + 2 <= _STACK_CAP
    )


def _quad_ok(bvh) -> bool:
    """The BVH4 walk needs the quad blob and stack headroom: each pop removes
    one entry and pushes up to four, so live depth is ≤ 3·depth4 + 1."""
    return (
        BVH_QUAD
        and getattr(bvh, "quad_blob", None) is not None
        and getattr(bvh, "quad_depth_token", None) is not None
        and 3 * int(bvh.quad_depth_token.shape[0]) + 2 <= _STACK_CAP
    )


def _bvh_closest_unsorted(bvh, ro: V3, rd: V3, t_min: float, t_max: float):
    n = ro.x.shape[0]
    rows, block_rows = _blocks(n)
    m = bvh.n_nodes
    leaf_size = int(bvh.slots.shape[1])

    spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def rows2(a):
        return a.reshape(rows, LANES)

    tree_blob = bvh.tree_blob
    if _quad_ok(bvh):
        assert block_rows * LANES < (1 << _PACK_FIELD), "packed counts overflow"
        m4 = int(bvh.quad_blob.shape[1]) // _NODE4_F
        kernel = partial(
            _bvh4_closest_kernel, m4, leaf_size, float(t_min), float(t_max)
        )
        scratch = [pltpu.SMEM((_STACK_CAP,), jnp.int32)]
        tree_blob = bvh.quad_blob
    elif _ordered_ok(bvh):
        kernel = partial(
            _bvh_closest_ordered_kernel, m, leaf_size, float(t_min), float(t_max)
        )
        scratch = [pltpu.SMEM((_STACK_CAP,), jnp.int32)]
    else:
        kernel = partial(
            _bvh_closest_kernel, m, leaf_size, float(t_min), float(t_max)
        )
        scratch = []

    bt, bi = pl.pallas_call(
        kernel,
        grid=(rows // block_rows,),
        in_specs=[smem, smem] + [spec] * 6,
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
        scratch_shapes=scratch,
    )(
        tree_blob, bvh.slot_blob,
        rows2(ro.x), rows2(ro.y), rows2(ro.z),
        rows2(rd.x), rows2(rd.y), rows2(rd.z),
    )
    return bt.reshape(n), _decode_gid(bi.reshape(n), _packed(bvh))


def bvh_any_pallas(bvh, ro: V3, rd: V3, t_min: float, limit):
    """Occlusion mask with per-lane ``limit``; early-exits once every lane in
    the block is occluded.  Coherence-sorted like ``bvh_closest_pallas``."""
    n = ro.x.shape[0]
    if _sort_enabled(n):
        iota = jnp.arange(n, dtype=jnp.int32)
        limit_v = jnp.broadcast_to(jnp.asarray(limit, jnp.float32), (n,))
        _k, sx, sy, sz, sdx, sdy, sdz, slim, sidx = jax.lax.sort(
            [_sort_key(bvh, ro, rd), ro.x, ro.y, ro.z, rd.x, rd.y, rd.z,
             limit_v, iota],
            num_keys=1, is_stable=True,
        )
        found = _bvh_any_unsorted(
            bvh, V3(sx, sy, sz), V3(sdx, sdy, sdz), t_min, slim
        )
        _i, found_u = jax.lax.sort(
            [sidx, found.astype(jnp.int32)], num_keys=1, is_stable=True
        )
        return found_u > 0
    return _bvh_any_unsorted(bvh, ro, rd, t_min, limit)


def _bvh_any_unsorted(bvh, ro: V3, rd: V3, t_min: float, limit):
    n = ro.x.shape[0]
    rows, block_rows = _blocks(n)
    m = bvh.n_nodes
    leaf_size = int(bvh.slots.shape[1])

    spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def rows2(a):
        return a.reshape(rows, LANES)

    tree_blob = bvh.tree_blob
    limit_v = jnp.broadcast_to(jnp.asarray(limit, jnp.float32), (n,))
    if _quad_ok(bvh):
        assert block_rows * LANES < (1 << _PACK_FIELD), "packed counts overflow"
        m4 = int(bvh.quad_blob.shape[1]) // _NODE4_F
        if _mxu_leaf_ok(bvh):
            featm = _feat_matrix(ro, rd, limit_v)
            fspec = pl.BlockSpec((16, block_rows * LANES), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
            vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
            found = pl.pallas_call(
                partial(_bvh4_any_mxu_kernel, m4, leaf_size, float(t_min)),
                grid=(rows // block_rows,),
                in_specs=[smem, smem, vmem_full] + [spec] * 7 + [fspec],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                scratch_shapes=[pltpu.SMEM((_STACK_CAP,), jnp.int32)],
            )(
                bvh.quad_blob, bvh.slot_blob, bvh.leaf_mat,
                rows2(ro.x), rows2(ro.y), rows2(ro.z),
                rows2(rd.x), rows2(rd.y), rows2(rd.z),
                rows2(limit_v), featm,
            )
            return found.reshape(n) > 0.5
        kernel = partial(_bvh4_any_kernel, m4, leaf_size, float(t_min))
        scratch = [pltpu.SMEM((_STACK_CAP,), jnp.int32)]
        tree_blob = bvh.quad_blob
    elif _ordered_ok(bvh):
        kernel = partial(_bvh_any_ordered_kernel, m, leaf_size, float(t_min))
        scratch = [pltpu.SMEM((_STACK_CAP,), jnp.int32)]
    else:
        kernel = partial(_bvh_any_kernel, m, leaf_size, float(t_min))
        scratch = []

    found = pl.pallas_call(
        kernel,
        grid=(rows // block_rows,),
        in_specs=[smem, smem] + [spec] * 7,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        scratch_shapes=scratch,
    )(
        tree_blob, bvh.slot_blob,
        rows2(ro.x), rows2(ro.y), rows2(ro.z),
        rows2(rd.x), rows2(rd.y), rows2(rd.z),
        rows2(limit_v),
    )
    return found.reshape(n) > 0.5
