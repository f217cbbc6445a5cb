"""utils/profiling: the timing helper must sync with the device through
dataclass results (the bug that made harness config 2 report dispatch-only
wall clock; see _leaves docstring)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from diffusynth_tpu.utils.profiling import _leaves, time_fn


@dataclasses.dataclass
class _Result:
    a: jnp.ndarray
    nested: dict
    sr: int


def test_leaves_sees_through_dataclasses():
    r = _Result(a=jnp.ones(3), nested={"b": jnp.zeros((2, 2)), "s": "x"},
                sr=16000)
    arrays = [leaf for leaf in _leaves(r)
              if hasattr(leaf, "block_until_ready")]
    assert len(arrays) == 2
    shapes = sorted(tuple(a.shape) for a in arrays)
    assert shapes == [(2, 2), (3,)]


def test_time_fn_blocks_on_dataclass_result():
    def fn():
        return _Result(a=jnp.ones(4) * 2, nested={}, sr=1)

    stats = time_fn(fn, iters=2, warmup=1)
    assert stats["p50"] >= 0.0 and stats["iters"] == 2


def test_leaves_plain_pytree():
    assert len(_leaves({"x": jnp.ones(1), "y": [jnp.ones(2), 3.0]})) == 3
    assert _leaves(np.ones(2))[0].shape == (2,)
