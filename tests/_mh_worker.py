"""One process of the 2-process cross-host test (test_multihost.py).

Spawned by test_two_process_engine: initializes jax.distributed over a
localhost coordinator with 4 virtual CPU devices per process, builds the
hybrid DCN/ICI mesh via BatchEngine(rcfg.mesh_shape=(4, 2)), runs two
greedy requests, and prints the token streams + owned_slots range as one
RESULT json line for the parent to compare across processes.
"""
import json
import os
import sys


def main() -> int:
    coord, pid = sys.argv[1], int(sys.argv[2])
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from fastllama_tpu.parallel import multihost
    multihost.initialize(coordinator_address=coord, num_processes=2,
                         process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8

    import numpy as np
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_session import tiny_vocab
    from test_sharding import HP, build_params

    from fastllama_tpu.config import RuntimeConfig
    from fastllama_tpu.engine.scheduler import BatchEngine, Request

    rng = np.random.default_rng(3)
    params = build_params(quantized=True, rng=rng)
    vocab = tiny_vocab(HP.n_vocab)
    rcfg = RuntimeConfig(kv_dtype="float32", weight_dtype="float32",
                         use_pallas=False, prefill_buckets=(8, 16),
                         mesh_shape=(4, 2))
    eng = BatchEngine(HP, params, vocab, n_slots=4, n_ctx=32, rcfg=rcfg,
                      temp=0.0)
    reqs = [Request(prompt=p, max_tokens=4)
            for p in ("w3 w4 w5", "w1 w2")]
    eng.run(reqs)
    owned = multihost.owned_slots(4, eng.mesh)
    print("RESULT " + json.dumps({
        "pid": pid,
        "tokens": [r.tokens_out for r in reqs],
        "owned": [owned.start, owned.stop],
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
