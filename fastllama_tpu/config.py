"""Model hyper-parameters and size registry.

Mirrors the reference's HyperParams (include/llama.hpp:79-102) and the
n_layer → model-id table (lib/llama.cpp:133-139), re-expressed as plain
dataclasses. The ggml memory-budget table (include/model_type.hpp:28-66) has
no TPU analog — XLA owns allocation — so only the identification part is kept.
"""
from __future__ import annotations

import dataclasses
import enum


class FType(enum.IntEnum):
    """Checkpoint weight type (reference: include/llama.hpp:23-32)."""
    ALL_F32 = 0
    MOSTLY_F16 = 1
    MOSTLY_Q4_0 = 2
    MOSTLY_Q4_1 = 3
    MOSTLY_Q4_1_SOME_F16 = 4
    MOSTLY_Q4_2 = 5
    MOSTLY_Q4_3 = 6


@dataclasses.dataclass(frozen=True)
class HyperParams:
    n_vocab: int = 32000
    n_ctx: int = 512
    n_embd: int = 4096
    n_mult: int = 256
    n_head: int = 32
    n_layer: int = 32
    n_rot: int = 64
    ftype: FType = FType.MOSTLY_F16

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @property
    def n_ff(self) -> int:
        """FFN width (reference formula: lib/llama.cpp:129)."""
        return ((2 * (4 * self.n_embd) // 3 + self.n_mult - 1)
                // self.n_mult) * self.n_mult

    def with_ctx(self, n_ctx: int) -> "HyperParams":
        return dataclasses.replace(self, n_ctx=n_ctx)


# n_layer -> canonical model name (lib/llama.cpp:133-139)
MODEL_ID_BY_LAYERS = {32: "7B", 40: "13B", 60: "30B", 80: "65B"}

# Canonical presets (LLaMA-1 family dims).
PRESETS: dict[str, HyperParams] = {
    "7B": HyperParams(n_embd=4096, n_head=32, n_layer=32, n_rot=128),
    "13B": HyperParams(n_embd=5120, n_head=40, n_layer=40, n_rot=128),
    "30B": HyperParams(n_embd=6656, n_head=52, n_layer=60, n_rot=128),
    "65B": HyperParams(n_embd=8192, n_head=64, n_layer=80, n_rot=128),
}


def model_id_from_layers(n_layer: int) -> str:
    return MODEL_ID_BY_LAYERS.get(n_layer, "7B")


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """Session/runtime knobs — the union of the reference's builder params
    (include/bridge.hpp:21-54, interfaces/python/fastllama.py:198-234) plus
    the TPU mesh/sharding knobs that replace its thread counts."""
    n_ctx: int = 512
    n_batch: int = 64                 # prefill chunk (reference n_batch)
    n_keep: int = 64                  # tokens kept on context recycle
    last_n_size: int = 64             # repetition-penalty window
    seed: int = 0
    should_get_all_logits: bool = False
    embedding_eval_enabled: bool = False
    # TPU-specific
    kv_dtype: str = "bfloat16"        # reference uses f32 (llama.hpp:104)
    weight_dtype: str = "bfloat16"    # dequant target dtype on the MXU
    mesh_shape: tuple[int, ...] = ()  # () = single chip
    mesh_axes: tuple[str, ...] = ("data", "model")
    # Single-stream sessions: reinterpret mesh_shape's data axis as the
    # SEQUENCE axis (parallel/ring.py) — the KV cache shards over positions
    # and prefill runs ring attention, so n_ctx scales out with chips.
    # Ignored by the BatchEngine (its data axis is the batch).
    seq_parallel: bool = False
    prefill_buckets: tuple[int, ...] = (16, 64, 128, 256, 512, 1024, 2048)
    use_pallas: bool | None = None    # None = auto
    # Activation-quantized int8 prefill matmuls (~2x MXU rate, ~0.5%
    # bounded requant noise; kernels/q4_matmul.q4_matmul_prefill_int8 —
    # the TPU re-design of the reference's q8_0-activation compute path,
    # lib/ggml.c:8105-8119, which the reference runs unconditionally).
    # Tri-state: None defers to FASTLLAMA_PREFILL_INT8, default ON for
    # bf16 production mode (quality measured inside the q4_0 gate's own
    # margin — see tests/test_perplexity_gate.py); explicit True/False
    # pins the path (False always = bit-faithful bf16 dequant).
    prefill_int8: bool | None = None
    # Tracing (reference analog: ggml perf counters + graph_print): when
    # set, FastLlama.generate / BatchEngine.run wrap their hot regions in
    # jax.profiler traces under this directory (utils/trace.py).
    profile_dir: str = ""
