"""Debug the fused step kernel: one priming call vs the known-good bounce."""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.compiler import compile_scene, pack_camera
from path_tracing__ray_tracer_tpu.models import path_tracer as pt
from path_tracing__ray_tracer_tpu.ops import intersect, rng
from path_tracing__ray_tracer_tpu.ops.camera import generate_rays
from path_tracing__ray_tracer_tpu.ops.v3 import V3
from path_tracing__ray_tracer_tpu.ops.pallas.bounce_pallas import (
    StepRec, StepStatics, pack_light_blob, pack_mat_blob, pack_tex_blob,
    path_step_pallas, path_bounce_pallas,
)
from path_tracing__ray_tracer_tpu.ops.pallas.intersect_pallas import (
    blob_layout, pack_scene_blob,
)

builder = ptrt.CustomSceneBuilder()
scene = builder.build_scene()
cam = builder.create_camera(1.0)
cs = compile_scene(scene)
cam12 = pack_camera(cam)

N, W, H, NS, MD = 256, 16, 16, 2, 3
total = W * H
STRIDE = (int(N * 0.6180339887) | 1) % N
lane = jnp.arange(N, dtype=jnp.int32)
pix0 = jnp.int32(0)
seed = jnp.uint32(7)
sbase = jnp.int32(0)

# make_ray for s=0
idx = pix0 + lane
safe = jnp.minimum(idx, total - 1)
x = (safe % W).astype(jnp.float32)
y = (safe // W).astype(jnp.float32)
key0 = rng.ray_key(seed, idx, sbase + 0)
r1 = rng.uniform(key0, MD, 0)
r2 = rng.uniform(key0, MD, 1)
o0, d0 = generate_rays(cam12, (x + r1) / W, (y + r2) / H)

tex_on = not (cs.any_textured is not None and cs.any_textured.shape[0] == 0)
statics = StepStatics(
    layout=blob_layout(cs), n_mats=int(cs.materials.diffuse.shape[0]),
    n_lights=cs.n_lights, n_tex=int(cs.n_textures), tex_on=tex_on,
    t_min=1e-3, t_max=1e6, shadow_light=False, jitter="independent",
    width=W, height=H, total=total, stride=STRIDE, n_pix=N, ns=NS,
    max_depth=MD,
)
blob = pack_scene_blob(cs)
mat_blob = pack_mat_blob(cs)
light_blob = pack_light_blob(cs)
tex_blob = pack_tex_blob(cs)
cam_smem = jnp.asarray(cam12, jnp.float32).reshape(1, 12)
scal = jnp.stack([
    pix0,
    jax.lax.bitcast_convert_type(seed, jnp.int32),
    sbase,
])[None, :]

zN = jnp.zeros((N,), jnp.float32)
oneN = jnp.ones((N,), jnp.float32)
rec0 = StepRec(idx=jnp.full((N,), -1, jnp.int32), hit=oneN, kill=zN, wnee=zN,
               rrs=oneN, sthr=oneN, tthr=zN, no=o0, nd=d0, mc=V3(zN, zN, zN))
ux0 = (idx % W).astype(jnp.int32)
uy0 = (idx // W).astype(jnp.int32)

with pltpu.force_tpu_interpret_mode():
    (rec1, o, d, thr, psum, key, depth, s, ploc, ux, uy, item, park
     ) = path_step_pallas(
        statics, blob, mat_blob, light_blob, tex_blob, cam_smem, scal,
        rec0, jnp.zeros((N,), jnp.int32), V3.full(1.0, (N,)),
        V3.full(0.0, (N,)), key0, jnp.full((N,), -1, jnp.int32),
        jnp.zeros((N,), jnp.int32), lane, ux0, uy0,
    )
    ref = path_bounce_pallas(cs, blob, mat_blob, light_blob, o0, d0,
                             V3.full(1.0, (N,)), key0, jnp.zeros((N,), jnp.int32))

print("priming state checks:")
print("  o == o0:", np.allclose(np.asarray(o.x), np.asarray(o0.x)),
      np.abs(np.asarray(o.x) - np.asarray(o0.x)).max())
print("  d == d0:", np.allclose(np.asarray(d.x), np.asarray(d0.x)),
      np.abs(np.asarray(d.x) - np.asarray(d0.x)).max())
print("  thr == 1:", np.asarray(thr.x).min(), np.asarray(thr.x).max())
print("  psum == 0:", np.abs(np.asarray(psum.x)).max())
print("  key == key0:", bool(np.all(np.asarray(key) == np.asarray(key0))))
print("  depth:", np.unique(np.asarray(depth)))
print("  s:", np.unique(np.asarray(s)))
print("  item parks:", np.unique(np.asarray(item)))
print("bounce record vs reference megakernel:")
for name in ("hit", "kill", "wnee", "rrs", "sthr", "tthr"):
    a = np.asarray(getattr(rec1, name))
    b = {"hit": np.asarray(ref.hit).astype(np.float32),
         "kill": np.asarray(ref.killed).astype(np.float32),
         "wnee": np.asarray(ref.w_nee), "rrs": np.asarray(ref.rr_scale),
         "sthr": np.asarray(ref.s_thr), "tthr": np.asarray(ref.t_thr)}[name]
    print(f"  {name}: max|diff| = {np.abs(a - b).max():.3e}")
print("  no:", np.abs(np.asarray(rec1.no.x) - np.asarray(ref.new_org.x)).max())
print("  nd:", np.abs(np.asarray(rec1.nd.x) - np.asarray(ref.new_dir.x)).max())
print("  mc:", np.abs(np.asarray(rec1.mc.x) - np.asarray(ref.mat_color.x)).max())

# texel index check vs XLA path
from path_tracing__ray_tracer_tpu.ops.texture import _nearest_index
tex_id = np.asarray(ref.tex_id)
idx_x = np.asarray(_nearest_index(
    jnp.asarray(tex_id, jnp.int32), ref.u, ref.v, cs.tex_width, cs.tex_height,
    cs.tex_offset, cs.n_textures))
idx_x = np.where(tex_id >= 0, idx_x, -1)
idx_k = np.asarray(rec1.idx)
print("  texel idx match:", np.array_equal(idx_k, idx_x),
      "frac textured:", (tex_id >= 0).mean())
if not np.array_equal(idx_k, idx_x):
    bad = idx_k != idx_x
    print("   mismatch count:", bad.sum(), "example k/x:",
          idx_k[bad][:5], idx_x[bad][:5])

# ---- step 2: glue(rec1) vs hand-computed XLA glue --------------------------
from path_tracing__ray_tracer_tpu.ops.texture import resolve_base_color

with pltpu.force_tpu_interpret_mode():
    texel1 = cs.atlas[jnp.maximum(rec1.idx, 0)]
    (rec2, o2, d2, thr2, psum2, key2, depth2, s2, ploc2, ux2, uy2, item2,
     park2) = path_step_pallas(
        statics, blob, mat_blob, light_blob, tex_blob, cam_smem, scal,
        rec1, texel1, thr, psum, key, depth, s, ploc, ux, uy,
    )
    base = resolve_base_color(
        cs, ref.mat_color, (ref.tex_id >= 0.0).astype(jnp.float32),
        ref.tex_id.astype(jnp.int32), ref.u, ref.v)

# XLA glue replication (bounce_step, non-defer)
active = np.asarray(s) < NS
wsky = np.where(np.asarray(ref.hit), 0.0, 0.1).astype(np.float32)
bx, by, bz = np.asarray(base.x), np.asarray(base.y), np.asarray(base.z)
thx = np.asarray(thr.x)
cax = np.where(active, thx * wsky + thx * (bx * np.asarray(ref.w_nee)), 0.0)
psx_want = np.asarray(psum.x) + cax
live = active & np.asarray(ref.hit) & ~np.asarray(ref.killed)
tnx = thx * np.asarray(ref.rr_scale) * (bx * np.asarray(ref.t_thr) + np.asarray(ref.s_thr))
tny = np.asarray(thr.y) * np.asarray(ref.rr_scale) * (by * np.asarray(ref.t_thr) + np.asarray(ref.s_thr))
tnz = np.asarray(thr.z) * np.asarray(ref.rr_scale) * (bz * np.asarray(ref.t_thr) + np.asarray(ref.s_thr))
thx_n = np.where(live, tnx, thx)
thy_n = np.where(live, tny, np.asarray(thr.y))
thz_n = np.where(live, tnz, np.asarray(thr.z))
maxc = np.maximum(thx_n, np.maximum(thy_n, thz_n))
live = live & (maxc >= 0.001)
ndepth = np.asarray(depth) + 1
live = live & (ndepth < MD)
done = active & ~live
s2_want = np.asarray(s) + done.astype(np.int32)

print("\nstep-2 glue checks:")
print("  done frac:", done.mean())
print("  s2 match:", np.array_equal(np.asarray(s2), s2_want))
print("  psum.x: max|diff| =", np.abs(np.asarray(psum2.x) +
      np.where(done, psx_want, 0.0) * 0 - np.where(done, 0.0, psx_want) -
      0.0).max() if False else np.abs(
      np.asarray(psum2.x) - np.where(done, 0.0, psx_want)).max())
print("  park item match:",
      np.array_equal(np.asarray(item2), np.where(done, np.asarray(s), NS)))
print("  park.x: max|diff| =",
      np.abs(np.asarray(park2.x) - np.where(done, psx_want, 0.0)).max())
print("  thr.x: max|diff| =",
      np.abs(np.asarray(thr2.x) - np.where(done & (s2_want < NS), 1.0, thx_n)).max())

# regen rays for done lanes
p_local2 = (np.asarray(ploc) + STRIDE) % N
ploc_want = np.where(done, p_local2, np.asarray(ploc))
idx2 = np.asarray(pix0) + ploc_want
key_w = rng.ray_key(seed, jnp.asarray(idx2), sbase + jnp.asarray(s2_want))
r1w = rng.uniform(key_w, MD, 0)
r2w = rng.uniform(key_w, MD, 1)
safe2 = np.minimum(idx2, total - 1)
xw = (safe2 % W).astype(np.float32)
yw = (safe2 // W).astype(np.float32)
ow, dw = generate_rays(cam12, (xw + np.asarray(r1w)) / W, (yw + np.asarray(r2w)) / H)
regen = done & (s2_want < NS)
o2_want = np.where(regen, np.asarray(ow.x), np.asarray(rec1.no.x))
d2_want = np.where(regen, np.asarray(dw.x), np.asarray(rec1.nd.x))
key2_want = np.where(regen, np.asarray(key_w), np.asarray(key))
print("  regen frac:", regen.mean())
print("  ploc match:", np.array_equal(np.asarray(ploc2), ploc_want))
print("  ux match:", np.array_equal(np.asarray(ux2), (idx2 % W).astype(np.int32) * 0 + np.asarray(ux2)))  # placeholder
print("  o2.x: max|diff| =", np.abs(np.asarray(o2.x) - o2_want).max())
print("  d2.x: max|diff| =", np.abs(np.asarray(d2.x) - d2_want).max())
print("  key2 match:", np.array_equal(np.asarray(key2), key2_want))
print("  depth2:", np.unique(np.asarray(depth2)),
      "want:", np.unique(np.where(live, ndepth, 0)))
print("  depth2 match:", np.array_equal(np.asarray(depth2), np.where(live, ndepth, 0)))
# ux/uy vs recomputed
ux_want = np.where(np.asarray(pix0) + ploc_want <= total - 1,
                   (idx2 % W), (idx2 % W))
print("  ux vs idx2%W:", np.array_equal(np.asarray(ux2), idx2 % W),
      " uy:", np.array_equal(np.asarray(uy2), idx2 // W))
