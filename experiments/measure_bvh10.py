"""Camera-coherent sanity for TRAV_ROWS=8 (rows sweep was incoherent-only)."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from path_tracing__ray_tracer_tpu.ops import bvh as bvh_mod
from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp
from path_tracing__ray_tracer_tpu.ops.v3 import V3
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import MeshSceneBuilder
from experiments.measure_bvh2 import scan_slope
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

b = MeshSceneBuilder(); scene = b.build_scene()
tris = [o for o in scene.objects if type(o).__name__ == "Triangle"]
v0 = np.array([[t.v0.x, t.v0.y, t.v0.z] for t in tris], np.float32)
v1 = np.array([[t.v1.x, t.v1.y, t.v1.z] for t in tris], np.float32)
v2 = np.array([[t.v2.x, t.v2.y, t.v2.z] for t in tris], np.float32)
arrs = bvh_mod.build_bvh(np.minimum(np.minimum(v0, v1), v2),
                         np.maximum(np.maximum(v0, v1), v2),
                         leaf_size=16, use_native=False)
bvh = bvh_mod.to_device(arrs, v0=v0, v1=v1, v2=v2)
n = 131072
W = 512; H = n // W
px = (np.arange(n, dtype=np.float32) % W + 0.5) / W - 0.5
py = (np.arange(n, dtype=np.float32) // W + 0.5) / H - 0.5
cam_o = np.array([0.0, -30.0, 8.0], np.float32)
fwd = np.array([0.0, 1.0, -0.25], np.float32); fwd /= np.linalg.norm(fwd)
rv = np.cross(fwd, [0, 0, 1]); rv /= np.linalg.norm(rv)
uv = np.cross(rv, fwd)
cd = (fwd[None] + rv[None] * (px * 1.2)[:, None] + uv[None] * (py * 0.7)[:, None]).astype(np.float32)
cd /= np.linalg.norm(cd, axis=1, keepdims=True)
o_cam = V3(*[jnp.asarray(np.broadcast_to(cam_o[i], (n,)).copy()) for i in range(3)])
d_cam = V3(*[jnp.asarray(cd[:, i]) for i in range(3)])
for rows in (8, 32):
    bp.TRAV_ROWS = rows
    def closest(i):
        eps = (i.astype(jnp.float32) + 1.0) * 1e-5
        bt, bi = bp.bvh_closest_pallas(bvh, V3(o_cam.x + eps, o_cam.y, o_cam.z), d_cam, 1e-3, 1e6)
        return bt.sum() + bi.sum()
    tc = scan_slope(closest)
    print(f"rows={rows}: camera closest {tc*1e3:.2f} ms = {n/tc/1e6:.1f} Mrays/s", flush=True)
bp.TRAV_ROWS = 8
print("done", flush=True)
