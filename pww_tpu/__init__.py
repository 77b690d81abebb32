"""pww_tpu — TPU-native paint-with-words Stable Diffusion framework.

A ground-up JAX/XLA/Pallas rebuild of ``cloneofsimo/paint-with-words-sd``:
the eDiffi "paint with words" cross-attention bias as a first-class operand of
a Flax SD pipeline, with the full denoise loop compiled as one scan and
multi-chip scaling via ``jax.sharding``.

Public API mirrors the reference package
(reference `paint_with_words/__init__.py:1-3`):
``paint_with_words``, ``paint_with_words_inpaint``, ``pww_load_tools``, plus
the class-style ``PwwPipeline`` replacing the two diffusers subclasses.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    CLIPTextConfig,
    MeshConfig,
    SchedulerConfig,
    SDModelConfig,
    UNetConfig,
    VAEConfig,
)
from .ops.weight_functions import (  # noqa: F401
    CustomWeightFunction,
    WeightFunction,
    as_weight_function,
)
from .pipeline.facade import (  # noqa: F401
    paint_with_words,
    paint_with_words_inpaint,
    pww_load_tools,
)
from .parallel.mesh import make_mesh  # noqa: F401
from .pipeline.pipeline import PwwPipeline  # noqa: F401
from .types import PwwState  # noqa: F401
from .training import train_textual_inversion  # noqa: F401
from .weights.textual_inversion import apply_textual_inversion  # noqa: F401
