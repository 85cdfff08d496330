"""sample_group 128 A/B at the honest bench config (budget 0).

The round-2/3 group sweep (measure_group.py) stopped at 64 — the knee from
below (8/16/32/64 -> 156/188/191/219 Mrays/s at budget 256).  Doubling the
group to 128 halves the number of regeneration tails and chunk dispatches
per spp; the costs that scale with NS (the (NS, N) accumulator fold, the
NS-roll re-binning) were measured small after the slot-buffered fold.  To
keep the Mosaic megakernel shape (N = chunk_rays // group = 131072 lanes)
on the warm compile cache, group 128 pairs with chunk_rays 1<<24.

Interleaved A/B/A/B over varied sample offsets (tunnel memoizes identical
buffers; contention noise is additive, min is the estimator).
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import path_tracing__ray_tracer_tpu as ptrt

b = ptrt.CustomSceneBuilder(); scene = b.build_scene()
cam = b.create_camera(1.0)
t0 = time.time()
warm = ptrt.RendererFactory.create("tpu_raytracer")
warm.render(scene, cam, ptrt.RenderSettings(128, 128, 1, 2))
print(f"process warmup {time.time()-t0:.1f}s", flush=True)

W = H = 1024
DEPTH = 8
CONFIGS = {
    "A(g128,c24)": dict(sample_group=128, chunk_rays=1 << 24),
    "B(g256,c25)": dict(sample_group=256, chunk_rays=1 << 25),
}
rend, sets = {}, {}
for name, kw in CONFIGS.items():
    g = kw["sample_group"]
    rend[name] = ptrt.RendererFactory.create(
        "tpu_path_raytracer", texture_budget=0, **kw)
    sets[name] = ptrt.RenderSettings(W, H, g, DEPTH)
    t0 = time.time()
    rend[name].render_sums(scene, cam, sets[name], sample_offset=0, n_samples=g)
    print(f"{name}: warmup {time.time()-t0:.1f}s", flush=True)

results = {n: [] for n in CONFIGS}
for rep in (1, 2, 3):
    for name, kw in CONFIGS.items():
        g = kw["sample_group"]
        t0 = time.time()
        rend[name].render_sums(
            scene, cam, sets[name], sample_offset=rep * 256, n_samples=g)
        el = time.time() - t0
        mrays = W * H * g * DEPTH / el / 1e6
        results[name].append(mrays)
        print(f"rep{rep} {name}: {el:.2f}s ({g}spp) -> {mrays:.1f} Mrays/s",
              flush=True)
for name, ms in results.items():
    print(f"{name}: best {max(ms):.1f} Mrays/s  all={[round(m,1) for m in ms]}",
          flush=True)
print("done", flush=True)
