"""raytrace2_tpu — a TPU-native differentiable path tracer.

A from-scratch JAX/XLA/Pallas re-design of the feature set of
tonadr1022/Raytrace2 (a C++ CPU path tracer following the Ray Tracing in One
Weekend series). Scenes load from the same JSON formats; rendering runs as
batched, jit-compiled wavefront computations that map ray-primitive
intersection onto the MXU and shard pixels/samples over TPU meshes.
"""

__version__ = "0.1.0"
