"""Does the 7 ns/elem HLO gather hold at multi-megabyte tables?

Round-2/3 measured flat 6-9 ns/elem for 128-262K entries; the full-res
atlas is 17.3M entries (69 MB) and the budget-0 render ran ~4x slower than
budget 256 — suspicion: the gather leaves the flat regime.  Also: honest
steady timings + RMSE for budgets 0/512/1024 (VERDICT #4 follow-up: budget
256 measured RMSE 6.15/255 vs budget 0 — NOT lossless).
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import path_tracing__ray_tracer_tpu as ptrt
from experiments.measure_bvh2 import scan_slope

b = ptrt.CustomSceneBuilder(); scene = b.build_scene()
t0 = time.time()
warm = ptrt.RendererFactory.create("tpu_raytracer")
warm.render(scene, b.create_camera(1.0), ptrt.RenderSettings(128, 128, 1, 2))
print(f"warmup {time.time()-t0:.1f}s", flush=True)

n = 131072
rng = np.random.default_rng(5)
for size in (262144, 1 << 20, 1 << 22, 17356986):
    table = jnp.asarray(rng.integers(0, 1 << 24, size=size, dtype=np.int64),
                        jnp.int32)
    idx0 = jnp.asarray(rng.integers(0, size, size=n), jnp.int32)

    def body(i):
        idx = (idx0 + i) % size
        return table[idx].sum().astype(jnp.float32)

    t = scan_slope(body)
    print(f"table={size:9d}: {t*1e3:.3f} ms = {t/n*1e9:.2f} ns/elem", flush=True)

# sorted-gather variant at the big table: does locality help?
size = 17356986
table = jnp.asarray(rng.integers(0, 1 << 24, size=size, dtype=np.int64), jnp.int32)
idx0 = jnp.asarray(rng.integers(0, size, size=n), jnp.int32)
def body_sorted(i):
    idx = (idx0 + i) % size
    sidx, iota = jax.lax.sort([idx, jnp.arange(n, dtype=jnp.int32)], num_keys=1)
    vals = table[sidx]
    _i, vals_u = jax.lax.sort([iota, vals], num_keys=1)
    return vals_u.sum().astype(jnp.float32)
t = scan_slope(body_sorted)
print(f"table={size} sorted-gather: {t*1e3:.3f} ms = {t/n*1e9:.2f} ns/elem", flush=True)

# honest per-budget steady render timing + RMSE vs budget 0
W = H = 1024; SPP = 128
s = ptrt.RenderSettings(W, H, SPP, 8)
cam = b.create_camera(1.0)
imgs = {}
for budget in (0, 512, 1024):
    r = ptrt.RendererFactory.create("tpu_path_raytracer", sample_group=32,
                                    texture_budget=budget)
    r.seed = 1; r.render(scene, cam, s)  # compile + first exec
    r.seed = 0
    t0 = time.time(); img = r.render(scene, cam, s); el = time.time() - t0
    print(f"budget={budget}: steady {el:.1f}s = "
          f"{W*H*SPP*8/el/1e6:.1f} Mrays/s", flush=True)
    imgs[budget] = np.asarray(img, dtype=np.float32)
for budget in (512, 1024):
    dd = imgs[budget] - imgs[0]
    print(f"RMSE(budget{budget}, budget0) = "
          f"{float(np.sqrt((dd*dd).mean())):.4f}/255 max={np.abs(dd).max():.0f}",
          flush=True)
print("done", flush=True)
