"""Top-level model loading: path in, LlamaModel out.

The TPU counterpart of Model::load (lib/llama.cpp:105-270): detects the
checkpoint flavor, loads weights (host-parallel reads + device_put), and
returns a ready LlamaModel. Accepts:

  * fltpu checkpoint directories (native; zero-copy repack-free load)
  * ggml-family files (GGML/GGMF/GGJT incl. multi-file shards) — q4_0
    payloads are repacked to the device layout in memory at load time, f16
    dense tensors are transposed; no on-disk conversion required, matching
    the reference's direct .bin loading.
"""
from __future__ import annotations

import time
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from ..config import FType, HyperParams, RuntimeConfig, model_id_from_layers
from ..engine.logger import Logger, NULL_LOGGER, ProgressTag
from ..io.checkpoint import load_params, open_checkpoint
from ..io.ggml_reader import (
    GGML_TYPE_F16, GGML_TYPE_F32, GGML_TYPE_Q4_0, GGML_TYPE_Q4_1,
    read_ggml_checkpoint,
)
from ..models.llama import LayerParams, LlamaParams
from ..quant.tensor import make_embedding, make_matmul_weight
from .runtime import LlamaModel


def _ggml_tensor_to_runtime(ckpt, name: str):
    ttype = ckpt.tensor_type(name)
    if ttype == GGML_TYPE_Q4_0:
        codes, scales = ckpt.q4_0(name)
        if name == "tok_embeddings.weight":
            return make_embedding(codes, scales)
        return make_matmul_weight(codes, scales)
    dense = ckpt.dense(name)
    if dense.ndim == 2 and name != "tok_embeddings.weight":
        dense = np.ascontiguousarray(dense.T)      # model wants [K, N]
    return jnp.asarray(dense)


def load_model(path: str, rcfg: RuntimeConfig = RuntimeConfig(),
               logger: Logger = NULL_LOGGER) -> LlamaModel:
    t0 = time.time()
    logger.log("Model", f"loading model from {path} - please wait ...\n")
    p = Path(path)

    if p.is_dir() and (p / "manifest.json").exists():
        ckpt = open_checkpoint(p)
        hp = ckpt.hp
        params = load_params(ckpt, logger=logger)
        vocab = ckpt.vocab
    else:
        ckpt = read_ggml_checkpoint(path)
        hp = ckpt.hyperparams
        vocab = ckpt.vocab
        names = ckpt.tensor_names()
        loaded = {}
        for i, nm in enumerate(names):
            loaded[nm] = _ggml_tensor_to_runtime(ckpt, nm)
            logger.progress(ProgressTag.LOAD, i + 1, len(names))
        layers = []
        for i in range(hp.n_layer):
            pre = f"layers.{i}."
            layers.append(LayerParams(
                attention_norm=loaded[pre + "attention_norm.weight"],
                wq=loaded[pre + "attention.wq.weight"],
                wk=loaded[pre + "attention.wk.weight"],
                wv=loaded[pre + "attention.wv.weight"],
                wo=loaded[pre + "attention.wo.weight"],
                ffn_norm=loaded[pre + "ffn_norm.weight"],
                w1=loaded[pre + "feed_forward.w1.weight"],
                w2=loaded[pre + "feed_forward.w2.weight"],
                w3=loaded[pre + "feed_forward.w3.weight"],
            ))
        params = LlamaParams(
            tok_embeddings=loaded["tok_embeddings.weight"],
            norm=loaded["norm.weight"],
            output=loaded["output.weight"],
            layers=layers)

    model_id = model_id_from_layers(hp.n_layer)
    logger.log("Model", f"n_vocab = {hp.n_vocab}\n")
    logger.log("Model", f"n_embd  = {hp.n_embd}\n")
    logger.log("Model", f"n_layer = {hp.n_layer} ({model_id})\n")
    logger.log("Model", f"n_ff    = {hp.n_ff}\n")
    model = LlamaModel(hp, params, vocab, rcfg, logger)
    logger.log("Model", f"loaded in {time.time() - t0:.2f}s\n")
    return model
