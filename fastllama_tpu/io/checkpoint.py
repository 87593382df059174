"""fltpu — the framework's native checkpoint format.

Replaces the reference's GGJT mmap path (include/file_loader.hpp) with a
TPU-first layout: tensors are stored in the *device* layout (split-K packed
nibble planes + scale planes, quant/tensor.py), so loading is mmap + per-
tensor `jax.device_put` with a sharding — no repacking or dequantization on
the load path. A checkpoint is a directory:

  manifest.json   — hyperparams, tensor table (kind/shape/offsets), version
  weights.bin     — 64-byte-aligned concatenated tensor payloads
  vocab.bin       — n_vocab x { len u32, bytes, score f32 }

Tensor names keep the ggml naming scheme (tok_embeddings.weight,
layers.N.attention.wq.weight, ...) so converter and LoRA mapping stay
1:1 with the reference's (scripts/convert.py:586-607).
"""
from __future__ import annotations

import dataclasses
import json
import os
import struct
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from ..config import FType, HyperParams
from ..engine.logger import Logger, NULL_LOGGER, ProgressTag
from ..engine.tokenizer import Vocab
from ..models.llama import LayerParams, LlamaParams
from ..quant.tensor import (
    QuantEmbedding, QuantMatmulWeight, split_pack_lastdim,
)
from ..quant.q4 import QK4_0

FORMAT = "fltpu.v1"
ALIGN = 64

# kind -> how the payload arrays are laid out
# q4_matmul:    qs uint8 [K/2, N] split-K packed, scales f32 [K/32, N]
# q4_embedding: qs uint8 [V, D/2] split-K packed, scales f32 [V, D/32]
# dense:        raw array, stored shape as-is (matmul weights stored [K, N])
KINDS = ("q4_matmul", "q4_embedding", "dense")


def _dtype_name(a: np.ndarray) -> str:
    return str(a.dtype)


class CheckpointWriter:
    def __init__(self, path: str | Path, hp: HyperParams, vocab: Vocab,
                 ftype: FType = FType.MOSTLY_Q4_0):
        self.path = Path(path)
        self.path.mkdir(parents=True, exist_ok=True)
        self.hp = hp
        self.ftype = ftype
        self.tensors: dict[str, dict] = {}
        self._f = open(self.path / "weights.bin", "wb")
        self._off = 0
        with open(self.path / "vocab.bin", "wb") as vf:
            for tok, score in vocab.id_to_token:
                vf.write(struct.pack("<I", len(tok)))
                vf.write(tok)
                vf.write(struct.pack("<f", score))

    def _write_payload(self, a: np.ndarray) -> list:
        pad = -self._off % ALIGN
        if pad:
            self._f.write(b"\0" * pad)
            self._off += pad
        start = self._off
        data = np.ascontiguousarray(a)
        self._f.write(data.tobytes())
        self._off += data.nbytes
        return [start, data.nbytes]

    def add_q4_matmul(self, name: str, codes: np.ndarray, scales: np.ndarray):
        """codes uint8 [N, K] row-major (quantizer output), scales [N, K/32].
        Stored transposed + split-K packed (the device layout)."""
        n, k = codes.shape
        codes_t = np.ascontiguousarray(codes.T)                  # [K, N]
        blocks = codes_t.reshape(k // QK4_0, QK4_0, n)
        packed = (blocks[:, :QK4_0 // 2, :] | (blocks[:, QK4_0 // 2:, :] << 4))
        packed = packed.reshape(k // 2, n).astype(np.uint8)
        scales_t = np.ascontiguousarray(scales.T.astype(np.float32))
        self.tensors[name] = {
            "kind": "q4_matmul", "shape": [k, n],
            "qs": self._write_payload(packed),
            "scales": self._write_payload(scales_t),
        }

    def add_q41_matmul(self, name: str, codes: np.ndarray, scales: np.ndarray,
                       mins: np.ndarray):
        """Affine (q4_1/GPTQ) weight: codes uint8 [N, K], scales/mins
        [N, K/32]. Stored transposed + split-K packed like q4_matmul, plus a
        mins plane."""
        n, k = codes.shape
        codes_t = np.ascontiguousarray(codes.T)
        blocks = codes_t.reshape(k // QK4_0, QK4_0, n)
        packed = (blocks[:, :QK4_0 // 2, :] | (blocks[:, QK4_0 // 2:, :] << 4))
        packed = packed.reshape(k // 2, n).astype(np.uint8)
        self.tensors[name] = {
            "kind": "q41_matmul", "shape": [k, n],
            "qs": self._write_payload(packed),
            "scales": self._write_payload(
                np.ascontiguousarray(scales.T.astype(np.float32))),
            "mins": self._write_payload(
                np.ascontiguousarray(mins.T.astype(np.float32))),
        }

    def add_q4_embedding(self, name: str, codes: np.ndarray, scales: np.ndarray):
        packed = split_pack_lastdim(codes)
        self.tensors[name] = {
            "kind": "q4_embedding", "shape": list(codes.shape),
            "qs": self._write_payload(packed),
            "scales": self._write_payload(np.asarray(scales, np.float32)),
        }

    def add_dense(self, name: str, a: np.ndarray):
        self.tensors[name] = {
            "kind": "dense", "shape": list(a.shape),
            "dtype": _dtype_name(a),
            "data": self._write_payload(a),
        }

    def finish(self) -> None:
        self._f.close()
        manifest = {
            "format": FORMAT,
            "ftype": int(self.ftype),
            "hyperparams": {
                "n_vocab": self.hp.n_vocab, "n_ctx": self.hp.n_ctx,
                "n_embd": self.hp.n_embd, "n_mult": self.hp.n_mult,
                "n_head": self.hp.n_head, "n_layer": self.hp.n_layer,
                "n_rot": self.hp.n_rot,
            },
            "tensors": self.tensors,
        }
        with open(self.path / "manifest.json", "w") as f:
            json.dump(manifest, f, indent=1)


def read_vocab_bin(path: Path, n_vocab: int) -> Vocab:
    toks = []
    with open(path, "rb") as f:
        for _ in range(n_vocab):
            ln, = struct.unpack("<I", f.read(4))
            word = f.read(ln)
            score, = struct.unpack("<f", f.read(4))
            toks.append((word, score))
    return Vocab.from_tokens(toks)


@dataclasses.dataclass
class Checkpoint:
    path: Path
    hp: HyperParams
    ftype: FType
    vocab: Vocab
    tensors: dict[str, dict]
    mm: np.memmap

    def _payload(self, rec: list, dtype, shape) -> np.ndarray:
        off, size = rec
        return self.mm[off:off + size].view(dtype).reshape(shape)

    def raw_q4_planes(self, name: str):
        """Unpadded device-layout planes: (qs, scales) for q4_matmul or
        (qs, scales, mins) for q41_matmul."""
        meta = self.tensors[name]
        if meta["kind"] not in ("q4_matmul", "q41_matmul"):
            raise ValueError(f"{name} is {meta['kind']}, not a q4 matmul")
        k, n = meta["shape"]
        qs = self._payload(meta["qs"], np.uint8, (k // 2, n))
        sc = self._payload(meta["scales"], np.float32, (k // QK4_0, n))
        if meta["kind"] == "q41_matmul":
            mn = self._payload(meta["mins"], np.float32, (k // QK4_0, n))
            return qs, sc, mn
        return qs, sc

    def raw_dense(self, name: str) -> np.ndarray:
        meta = self.tensors[name]
        return self._payload(meta["data"], np.dtype(meta["dtype"]),
                             tuple(meta["shape"]))

    def load_tensor(self, name: str, device_put=jnp.asarray):
        """Materialize one tensor in its runtime form.

        device_put: callable(np_array, name, role) -> jax.Array; the sharded
        loader passes a NamedSharding-aware version (parallel/sharding.py).
        """
        meta = self.tensors[name]
        kind = meta["kind"]
        if kind == "q4_matmul":
            k, n = meta["shape"]
            qs = self._payload(meta["qs"], np.uint8, (k // 2, n))
            sc = self._payload(meta["scales"], np.float32, (k // QK4_0, n))
            return QuantMatmulWeight(qs=device_put(qs, name, "qs"),
                                     scales=device_put(sc, name, "scales"))
        if kind == "q4_embedding":
            v, d = meta["shape"]
            qs = self._payload(meta["qs"], np.uint8, (v, d // 2))
            sc = self._payload(meta["scales"], np.float32, (v, d // QK4_0))
            return QuantEmbedding(qs=device_put(qs, name, "qs"),
                                  scales=device_put(sc, name, "scales"))
        if kind == "dense":
            a = self._payload(meta["data"], np.dtype(meta["dtype"]),
                              tuple(meta["shape"]))
            return device_put(a, name, "data")
        raise ValueError(f"unknown tensor kind {kind}")


def open_checkpoint(path: str | Path) -> Checkpoint:
    path = Path(path)
    with open(path / "manifest.json") as f:
        manifest = json.load(f)
    if manifest.get("format") != FORMAT:
        raise ValueError(f"{path}: not a {FORMAT} checkpoint")
    h = manifest["hyperparams"]
    hp = HyperParams(n_vocab=h["n_vocab"], n_ctx=h["n_ctx"], n_embd=h["n_embd"],
                     n_mult=h["n_mult"], n_head=h["n_head"],
                     n_layer=h["n_layer"], n_rot=h["n_rot"],
                     ftype=FType(manifest["ftype"]))
    vocab = read_vocab_bin(path / "vocab.bin", hp.n_vocab)
    mm = np.memmap(path / "weights.bin", dtype=np.uint8, mode="r")
    return Checkpoint(path=path, hp=hp, ftype=hp.ftype, vocab=vocab,
                      tensors=manifest["tensors"], mm=mm)


def load_params(ckpt: Checkpoint, logger: Logger = NULL_LOGGER,
                parallel: bool = True) -> LlamaParams:
    """Build the (fused-layout) LlamaParams pytree from a checkpoint.

    QKV and w1/w3 are fused at load (models/fuse.py column orders) directly
    on the packed planes — a pure column permutation. Host-side reads happen
    in a thread pool (the TPU analog of the reference's
    parallel_load_all_data, file_loader.hpp:550-587).
    """
    from ..models.fuse import (
        fuse_dense, fuse_packed, qkv_col_order, w13_col_order,
    )
    from ..quant.tensor import matmul_weight_from_planes

    hp = ckpt.hp

    def kind(nm):
        return ckpt.tensors[nm]["kind"]

    def single_matmul(nm):
        if kind(nm) == "q4_matmul":
            return matmul_weight_from_planes(*ckpt.raw_q4_planes(nm))
        if kind(nm) == "q41_matmul":
            qs, sc, mn = ckpt.raw_q4_planes(nm)
            return fuse_packed([(qs, sc, mn)], np.arange(qs.shape[1]))
        return jnp.asarray(ckpt.raw_dense(nm))       # stored [K, N]

    def fused(names, order):
        kinds = {kind(nm) for nm in names}
        if kinds <= {"q4_matmul", "q41_matmul"} and len(kinds) == 1:
            return fuse_packed([ckpt.raw_q4_planes(nm) for nm in names], order)
        return fuse_dense([np.asarray(ckpt.raw_dense(nm)) for nm in names],
                          order)

    hd = hp.head_dim

    def load_layer(i):
        p = f"layers.{i}."
        n_ff = ckpt.tensors[p + "feed_forward.w1.weight"]["shape"][1]
        return LayerParams(
            attention_norm=jnp.asarray(ckpt.raw_dense(p + "attention_norm.weight")),
            wqkv=fused([p + "attention.wq.weight", p + "attention.wk.weight",
                        p + "attention.wv.weight"],
                       qkv_col_order(hp.n_head, hd)),
            wo=single_matmul(p + "attention.wo.weight"),
            ffn_norm=jnp.asarray(ckpt.raw_dense(p + "ffn_norm.weight")),
            w13=fused([p + "feed_forward.w1.weight",
                       p + "feed_forward.w3.weight"], w13_col_order(n_ff)),
            w2=single_matmul(p + "feed_forward.w2.weight"),
        )

    total = hp.n_layer + 3
    done = 0
    layers = [None] * hp.n_layer
    if parallel:
        with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1)) as ex:
            for i, layer in zip(range(hp.n_layer),
                                ex.map(load_layer, range(hp.n_layer))):
                layers[i] = layer
                done += 1
                logger.progress(ProgressTag.LOAD, done, total)
    else:
        for i in range(hp.n_layer):
            layers[i] = load_layer(i)
            done += 1
            logger.progress(ProgressTag.LOAD, done, total)

    emb_meta = ckpt.tensors["tok_embeddings.weight"]
    if emb_meta["kind"] == "q4_embedding":
        v, d = emb_meta["shape"]
        emb = QuantEmbedding(
            qs=jnp.asarray(ckpt._payload(emb_meta["qs"], np.uint8, (v, d // 2))),
            scales=jnp.asarray(ckpt._payload(emb_meta["scales"], np.float32,
                                             (v, d // QK4_0))))
    else:
        emb = jnp.asarray(ckpt.raw_dense("tok_embeddings.weight"))
    logger.progress(ProgressTag.LOAD, done + 1, total)
    out = single_matmul("output.weight")
    logger.progress(ProgressTag.LOAD, done + 2, total)

    return LlamaParams(
        tok_embeddings=emb,
        norm=jnp.asarray(ckpt.raw_dense("norm.weight")),
        output=out,
        layers=layers,
    )
