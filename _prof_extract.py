"""Split the mass-32 extraction wall: fingerprints / upload / dispatch / finalize."""
import time
import numpy as np
import jax, jax.numpy as jnp
import bench
from yamimageprocessor_tpu.ops import extraction_device as XD
from yamimageprocessor_tpu.ops import color as C

side = 1024
frames32 = [np.repeat(bench._dense_scene(side, seed=s)[..., None], 3, axis=-1)
            for s in range(32)]
XD.region_tables_device(frames32)  # warm compile + caches

def wall(fn, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter(); fn(); best = min(best, time.perf_counter() - t0)
    return best

# full (device path, memo cleared)
def full():
    XD._TABLE_CACHE.clear()
    XD.region_tables_device(frames32)
t_full = wall(full)
print(f"full region_tables_device      {t_full*1e3:8.1f} ms  ({32*side*side/1e6/t_full:6.1f} MPix/s)")

# fingerprints only
def fps():
    for f in frames32:
        XD._frame_token(np.ascontiguousarray(f))
t_fp = wall(fps)
print(f"content fingerprints (32 BGR)  {t_fp*1e3:8.1f} ms")

# host gray conversion
def grays():
    return [C.bgr_to_gray_np(f) for f in frames32]
t_gray = wall(grays)
print(f"host bgr->gray (32)            {t_gray*1e3:8.1f} ms")

g32 = np.stack(grays())
dev = jax.device_put(g32); dev.block_until_ready()

# upload
def up():
    jax.device_put(g32).block_until_ready()
t_up = wall(up)
print(f"H2D 32x1MB gray stack          {t_up*1e3:8.1f} ms")

# batched bundle dispatch + fetch (tier 64)
bfn = XD._jitted_region_packed_batch(XD.FAST_REGIONS)
labels_b, bundles_b = bfn(dev)
jax.block_until_ready(bundles_b)
def disp():
    _, b = bfn(dev)
    np.asarray(b)
t_disp = wall(disp)
print(f"tier-64 batch dispatch+fetch   {t_disp*1e3:8.1f} ms")

# finalize (host)
fetched = np.asarray(bundles_b)
def fin():
    for k in range(32):
        XD._finalize_region_table(fetched[k], lambda k=k: labels_b[k], XD.FAST_REGIONS)
t_fin = wall(fin)
print(f"finalize x32 (host)            {t_fin*1e3:8.1f} ms")
print(f"sum of parts                   {(t_fp+t_gray+t_disp+t_fin)*1e3:8.1f} ms (upload cached in steady state)")
