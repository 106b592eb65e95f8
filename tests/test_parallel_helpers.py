"""Fast unit tests for the multi-process placement helpers.

The REAL 2-process semantics (make_array_from_process_local_data assembly,
collective gathers) are exercised end-to-end by ``test_multiprocess.py``;
these pin the single-process contracts and the divisibility guards on the
8-device virtual mesh.
"""

import jax
import numpy as np
import pytest

from sid_lsg_tpu.parallel import (
    global_put,
    make_mesh,
    process_local_rows,
    shard_round_batch,
)
from sid_lsg_tpu.parallel.mesh import batch_sharding
from sid_lsg_tpu.runtime.checkpoint import fetch_to_host, fetch_tree_to_host


def test_process_local_rows_single_process():
    # 1 process: every global row is local.
    assert process_local_rows(4) == 4
    assert process_local_rows(1) == 1


def test_process_local_rows_divisibility(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    assert process_local_rows(8) == 4
    with pytest.raises(ValueError, match="not divisible"):
        process_local_rows(5)


def test_global_put_matches_device_put():
    mesh = make_mesh(dp=4, fsdp=2)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    s = batch_sharding(mesh, x.ndim)
    a = global_put(x, s)
    b = jax.device_put(x, s)
    assert a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shard_round_batch_placement():
    mesh = make_mesh(dp=4, fsdp=2)
    batch = {
        "emb_g": np.ones((2, 8, 4, 16), np.float32),  # ROUND_BATCH_KEYS member
        "uncond_emb": np.ones((4, 16), np.float32),   # replicated
    }
    placed = shard_round_batch(batch, mesh)
    # Round data: microbatch axis (axis 1) split over the whole mesh.
    assert placed["emb_g"].sharding.spec[1] == ("dp", "fsdp")
    # Replicated keys: no partitioned dims.
    assert placed["uncond_emb"].is_fully_replicated
    np.testing.assert_array_equal(np.asarray(placed["emb_g"]), batch["emb_g"])


def test_fetch_to_host_sharded_and_plain():
    mesh = make_mesh(dp=4, fsdp=2)
    x = np.arange(16, dtype=np.float32).reshape(8, 2)
    sharded = jax.device_put(x, batch_sharding(mesh, x.ndim))
    np.testing.assert_array_equal(fetch_to_host(sharded), x)
    np.testing.assert_array_equal(fetch_to_host(x), x)
    np.testing.assert_array_equal(fetch_to_host([1.0, 2.0]), [1.0, 2.0])


def test_fetch_tree_to_host():
    mesh = make_mesh(dp=4, fsdp=2)
    x = np.arange(16, dtype=np.float32).reshape(8, 2)
    tree = {
        "sharded": jax.device_put(x, batch_sharding(mesh, x.ndim)),
        "plain": {"y": np.float32(3.0), "z": jax.device_put(x)},
    }
    out = fetch_tree_to_host(tree)
    np.testing.assert_array_equal(out["sharded"], x)
    np.testing.assert_array_equal(out["plain"]["z"], x)
    assert float(out["plain"]["y"]) == 3.0
    assert all(isinstance(v, np.ndarray)
               for v in jax.tree_util.tree_leaves(out))
