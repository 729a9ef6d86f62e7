"""CLI flag plumbing for the round-3 additions: --precond, --restarts,
--rhs-batch — happy paths through cli.main plus the forbidden-combo
errors (clean SystemExit, not a deep traceback)."""
import contextlib
import io
import json

import numpy as np
import pytest

from mpi_bicgstab_tpu.cli import main


def _run(argv):
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main(argv)
    lines = [ln for ln in out.getvalue().strip().splitlines() if ln]
    return rc, json.loads(lines[-1])


def test_cli_precond_solves():
    rc, row = _run(["solve", "--matrix", "transport-hard:4096",
                    "--tol", "1e-10", "--precond", "cheby:8", "--json"])
    assert rc == 0
    assert row["converged"] is True
    assert row["precond"].startswith("cheby:8:")
    assert row["total_iter"] < 100          # ~8x below the plain ~280


def test_cli_restarts_zero_reproduces_reference_behavior():
    # the pipe stall fixture: default restarts rescue it, 0 must not
    rc0, row0 = _run(["solve", "--matrix", "banded:512", "--method",
                      "pipe_bicgstab", "--restarts", "0", "--json"])
    rc1, row1 = _run(["solve", "--matrix", "banded:512", "--method",
                      "pipe_bicgstab", "--json"])
    assert row1["converged"] is True and rc1 == 0
    assert row1["true_relres"] < 1e-13
    # reference behavior: est hits tol, truth may stall (exit code 2)
    if row0["converged"] is False:
        assert rc0 == 2


def test_cli_rhs_batch(tmp_path):
    from mpi_bicgstab_tpu.models.generators import transport_hard
    csr = transport_hard(4096)
    rng = np.random.default_rng(0)
    X = rng.standard_normal((3, csr.nrows))
    f = tmp_path / "B.npy"
    np.save(f, np.stack([csr.matvec(X[j]) for j in range(3)]))
    xs = tmp_path / "X.npy"
    rc, row = _run(["solve", "--matrix", "transport-hard:4096",
                    "--tol", "1e-11", "--rhs-batch", str(f),
                    "--write-solution", str(xs), "--json"])
    assert rc == 0
    assert row["batch"] == 3 and all(row["converged"])
    assert np.abs(np.load(xs) - X).max() < 1e-6


def test_cli_forbidden_combos(tmp_path):
    f = tmp_path / "B.npy"
    np.save(f, np.zeros((2, 16)))
    x0 = tmp_path / "x0.npy"
    np.save(x0, np.zeros(4096))
    with pytest.raises(SystemExit, match="single-device"):
        main(["solve", "--matrix", "transport-hard:4096", "--devices",
              "8", "--rhs-batch", str(f)])
    with pytest.raises(SystemExit, match="does not map"):
        main(["solve", "--matrix", "transport-hard:4096", "--precond",
              "cheby:4", "--x0", str(x0)])
    with pytest.raises(SystemExit):
        main(["solve", "--matrix", "transport-hard:4096", "--rhs-batch",
              str(f), "--repeat", "3"])


def test_cli_selftest_passes():
    """`selftest` (the install/backend validator) must be green on the
    virtual CPU mesh — it is the user-facing smoke sweep over every
    solver family, layout, and precision."""
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main(["selftest", "--devices", "2"])
    text = out.getvalue()
    assert rc == 0
    assert "FAIL" not in text
    assert "distributed/bicgstab x2" in text
