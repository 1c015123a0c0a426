from seedx_tpu.inference.runtime import SeedXRuntime  # noqa: F401
