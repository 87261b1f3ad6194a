"""Parameter-surface tests of the blocked path (group_size, refine,
precision) and accuracy on an ill-conditioned input."""

import numpy as np
import pytest

from gpu_matrix_inversion_tpu.ops.blocked import blocked_inverse
from gpu_matrix_inversion_tpu.utils.generators import (
    hollow_random_matrix,
    ill_conditioned_matrix,
)
from gpu_matrix_inversion_tpu.utils.residual import relative_residual


def test_group_sizes_agree():
    a = hollow_random_matrix(512, seed=100)
    for g in (1, 2, 4):
        inv, ok = blocked_inverse(a, block_size=128, group_size=g)
        assert bool(ok)
        assert relative_residual(a, np.asarray(inv)) < 1e-5, f"group={g}"


def test_refine_improves_residual():
    a = hollow_random_matrix(512, seed=101)
    raw, ok0 = blocked_inverse(a, refine=0)
    ref, ok1 = blocked_inverse(a, refine=1)
    assert bool(ok0) and bool(ok1)
    assert (relative_residual(a, np.asarray(ref))
            <= relative_residual(a, np.asarray(raw)))


def test_bad_precision_rejected():
    with pytest.raises(ValueError):
        blocked_inverse(np.eye(64, dtype=np.float32), precision="bogus")


def test_ill_conditioned_with_refine():
    a = ill_conditioned_matrix(256, cond=1e5, seed=102)
    inv, ok = blocked_inverse(a, refine=2)
    assert bool(ok)
    assert relative_residual(a, np.asarray(inv)) < 1e-5


def test_refine_keeps_singular_flag():
    a = np.ones((256, 256), dtype=np.float32)
    _, ok = blocked_inverse(a, refine=1)
    assert not bool(ok)


def test_block_sizes_not_multiple_of_16():
    """Review regression: sub must divide b, else the kernel silently skips
    the last b % 16 pivot steps (n in {24,40,...,120} or block_size=40)."""
    import numpy as np
    from gpu_matrix_inversion_tpu.ops.blocked import blocked_inverse
    from gpu_matrix_inversion_tpu.utils.generators import hollow_random_matrix
    from gpu_matrix_inversion_tpu.utils.residual import relative_residual

    for n, bs in ((24, 256), (40, 256), (120, 256), (256, 40)):
        a = hollow_random_matrix(n, seed=n + bs)
        inv, ok = blocked_inverse(a, block_size=bs, refine=0)
        assert bool(ok), (n, bs)
        assert relative_residual(a, np.asarray(inv)) < 1e-4, (n, bs)


def test_tail_group_non_dividing_panel_count():
    """Prime-ish panel counts must not collapse grouping (N=10000 has 157
    panels at b=64): a shorter tail group handles the remainder."""
    import numpy as np
    from gpu_matrix_inversion_tpu.ops.blocked import blocked_inverse
    from gpu_matrix_inversion_tpu.utils.generators import hollow_random_matrix
    from gpu_matrix_inversion_tpu.utils.residual import relative_residual

    # 11 panels of b=8, group 4 -> 2 full groups + tail of 3
    a = hollow_random_matrix(88, seed=88)
    inv, ok = blocked_inverse(a, block_size=8, group_size=4, refine=0)
    assert bool(ok)
    assert relative_residual(a, np.asarray(inv)) < 1e-4
    # 7 panels, group 4 -> 1 full group + tail of 3; also fp64 (jnp path)
    a = hollow_random_matrix(56, seed=56, dtype=np.float64)
    inv, ok = blocked_inverse(a, block_size=8, group_size=4, refine=1)
    assert bool(ok)
    assert relative_residual(a, np.asarray(inv)) < 1e-10
