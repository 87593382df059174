"""fastllama_tpu — a TPU-native quantized LLaMA inference framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
PotatoSpudowski/fastLLaMa (reference surveyed in SURVEY.md): 4-bit blockwise
weight quantization, resident system prompts with context recycling, session
state save/load, runtime LoRA attach/detach with cached ΔW, streaming
generation with stop words, perplexity evaluation — plus the TPU-scale parts
the reference never had: tensor sharding over a device mesh, paged KV cache,
and continuous batching.
"""
from .version import __version__
from .api import Model
from .config import FType, HyperParams, RuntimeConfig
from .engine.logger import DefaultLogger, Logger, ProgressTag
from .engine.session import FastLlama

__all__ = ["__version__", "Model", "FType", "HyperParams", "RuntimeConfig",
           "Logger", "DefaultLogger", "ProgressTag", "FastLlama"]
