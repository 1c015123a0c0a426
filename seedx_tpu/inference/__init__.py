from seedx_tpu.inference.chat import ChatSession  # noqa: F401
from seedx_tpu.inference.continuous import ContinuousEngine  # noqa: F401
from seedx_tpu.inference.runtime import SeedXRuntime  # noqa: F401
from seedx_tpu.inference.serving import ServingEngine  # noqa: F401
