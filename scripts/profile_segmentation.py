"""Per-op timing breakdown of the flagship segmentation chain @2048^2.

Dev tool (not shipped in bench): identifies which op bounds the chain so
optimization effort lands where the time is.
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from yamimageprocessor_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()

from bench import _dense_scene
from yamimageprocessor_tpu.models.stages import segmentation_steps
from yamimageprocessor_tpu.pipeline.compiler import get_compiled_chain

side = 2048
frame = _dense_scene(side)

def timeit(fn, dev, reps=10):
    int(np.asarray(jnp.sum(fn(dev).astype(jnp.uint32))))  # warm? no: fn returns array
    start = time.perf_counter()
    outs = [fn(dev) for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - start) / reps

# full chain and per-prefix timings
steps = segmentation_steps(watershed=True)
dev = jax.device_put(frame)
prev = 0.0
for k in range(1, len(steps) + 1):
    chain = get_compiled_chain(steps[:k], frame.shape, frame.dtype)
    fn, dyn = chain.pure_callable()
    run = jax.jit(lambda x: fn(x, dyn)[-1])
    t = timeit(run, dev)
    print(f"prefix {k} ({steps[k-1].name}): {t*1000:.2f} ms (step +{(t-prev)*1000:.2f} ms)")
    prev = t

# watershed internals
from yamimageprocessor_tpu.ops import distance as D
from yamimageprocessor_tpu.ops.distance_pallas import distance_transform_pallas
binary = (frame > 128).astype(np.uint8)
bdev = jax.device_put(binary)
dt = jax.jit(distance_transform_pallas)
t = timeit(dt, bdev)
print(f"chamfer distance pallas: {t*1000:.2f} ms")

from yamimageprocessor_tpu.ops import labeling_pallas as LP
names = [n for n in dir(LP) if not n.startswith('_')]
print("labeling_pallas exports:", names)
