"""Single-launch row unpack (ops/unpack_rows.py): layout and values must
match plain slicing for the SD1.5 channel mix, any dtype, and padding."""

import jax
import jax.numpy as jnp
import numpy as np

from ctrlora_tpu.ops.unpack_rows import pack_row_tables, unpack_rows


def test_pack_then_unpack_roundtrip():
    rng = np.random.default_rng(0)
    sizes = [320, 320, 640, 1280, 1280, 640, 320]  # SD-like channel mix
    tables = {
        f"blk{i}": jnp.asarray(rng.normal(size=(5, c)).astype(np.float32))
        for i, c in enumerate(sizes)
    }
    packed, names, out_sizes = pack_row_tables(tables)
    assert packed.shape == (5, len(sizes), 1280)
    for s in range(5):
        rows = unpack_rows(packed[s], out_sizes, interpret=True)
        for name, c, row in zip(names, out_sizes, rows):
            assert row.shape == (1, c)
            np.testing.assert_array_equal(
                np.asarray(row[0]), np.asarray(tables[name][s])
            )


def test_unpack_bf16_and_broadcast_shape():
    block = jnp.arange(2 * 256, dtype=jnp.bfloat16).reshape(2, 256)
    r0, r1 = unpack_rows(block, [128, 256], interpret=True)
    np.testing.assert_array_equal(np.asarray(r0[0]), np.asarray(block[0, :128]))
    np.testing.assert_array_equal(np.asarray(r1[0]), np.asarray(block[1]))
    # [1, C] must broadcast against NHWC exactly like [C]
    h = jnp.zeros((2, 4, 4, 256), jnp.float32)
    assert (h + r1.astype(h.dtype)).shape == h.shape
