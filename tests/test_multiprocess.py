"""Multi-process (multi-host) data-parallel training test.

The TPU-pod analogue run on CPU: 2 OS processes × 4 virtual devices each,
joined by jax.distributed into one 8-device mesh, trained through the real
``fit()`` loop — must produce bitwise the same parameters as one process
with 8 devices (probe-loss equality; see dmme_tpu/parallel/mp_check.py).
SURVEY §2 "Parallelism & distributed communication"; VERDICT r1 item 2.
"""

import pytest

from dmme_tpu.parallel.mp_check import spawn


class TestMultiProcess:
    @pytest.mark.slow
    def test_two_process_fit_matches_single_process(self):
        multi = spawn(nproc=2, ndev_per_proc=4)
        single = spawn(nproc=1, ndev_per_proc=8)
        assert len(multi) == 2
        # all processes of the multi run agree (replicated params)
        assert multi[0] == multi[1], multi
        # and match the single-process layout bitwise
        assert multi[0] == single[0], (multi, single)
