"""sample_group 256 vs 128 A/B at the honest bench config (budget 0).

Extends the group sweep one more doubling past the measure_group128 result
(128 beat 64 by ~2.5%).  Group 256 pairs with chunk_rays 1<<25 so both
configs run the SAME 131072-lane kernel (N = chunk_rays // group); only the
per-chunk item count and the (NS, N) accumulator/re-binning shapes change.
Measured: group 256 LOSES ~9% (194.9–195.7 vs 212.6–213.7 Mrays/s) — the
(NS, N) one-hot fold and the NS-roll re-binning scale with NS and overtake
the halved tail/dispatch savings.  128 is the knee and the shipped default.

Interleaved A/B/A/B over varied sample offsets (tunnel memoizes identical
buffers; contention noise is additive, best-of is the estimator).
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
