"""Cornell headline chunk_rays sweep (ROADMAP §3): steady bench-config
throughput at chunk_rays 1<<22 / 1<<23 / 1<<24.  Fewer chunks mean less
regeneration tail and fewer dispatches; the open question is VMEM headroom
at 1<<24.  Timing protocol: warm each executable with one group, then time
2 further groups at distinct sample offsets (tunnel memoizes identical
buffers — never repeat).
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import path_tracing__ray_tracer_tpu as ptrt

W = H = 1024
DEPTH = 8
GROUP = 64

b = ptrt.CustomSceneBuilder()
scene = b.build_scene()
cam = b.create_camera(1.0)

t0 = time.time()
warm = ptrt.RendererFactory.create("tpu_raytracer")
warm.render(scene, cam, ptrt.RenderSettings(128, 128, 1, 2))
print(f"warmup {time.time()-t0:.1f}s", flush=True)

settings = ptrt.RenderSettings(W, H, GROUP, DEPTH)
for shift in (23, 22, 24):
    r = ptrt.RendererFactory.create(
        "tpu_path_raytracer", sample_group=GROUP, chunk_rays=1 << shift,
        texture_budget=0,
    )
    try:
        t0 = time.time()
        r.render_sums(scene, cam, settings, sample_offset=0, n_samples=GROUP)
        print(f"chunk=1<<{shift}: warm group {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        for k in (1, 2):
            r.render_sums(scene, cam, settings,
                          sample_offset=k * GROUP, n_samples=GROUP)
        el = time.time() - t0
        mr = W * H * 2 * GROUP * DEPTH / el / 1e6
        print(f"chunk=1<<{shift}: steady {el:.2f}s -> {mr:.1f} Mrays/s",
              flush=True)
    except Exception as e:  # noqa: BLE001 — record OOM/compile failures
        print(f"chunk=1<<{shift}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
print("done", flush=True)
