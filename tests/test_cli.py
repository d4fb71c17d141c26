"""CLI smoke tests: fit -> checkpoint -> simulate -> lrt on a small
synthetic lightcurve (the script pipeline the reference documents but
does not ship)."""
import json

import numpy as np
import pytest

from mind_the_gaps_tpu.cli import main
from mind_the_gaps_tpu.kernels import DampedRandomWalk


@pytest.fixture(scope="module")
def lc_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    n = 150
    t = np.cumsum(rng.uniform(2.0, 8.0, n))
    true = DampedRandomWalk(log_S0=np.log(4.0), log_omega0=np.log(0.05))
    tau = np.abs(t[:, None] - t[None, :])
    K = np.array(true.covariance(tau)) + np.diag(np.full(n, 0.09))
    y = 10.0 + np.linalg.cholesky(K) @ rng.normal(size=n)
    out = np.column_stack([t, y, np.full(n, 0.3), np.full(n, 1.0), np.zeros(n), np.zeros(n)])
    path = tmp_path_factory.mktemp("cli") / "lc.dat"
    np.savetxt(path, out, header="t\trate\terror\texposure\tbkg_rate\tbkg_rate_err")
    return str(path)


def test_cli_fit_simulate_lrt(lc_file, tmp_path, capsys):
    chain = str(tmp_path / "chain.npz")
    main(["fit", lc_file, "--kernel", "drw", "--max-steps", "300",
          "--walkers", "12", "--output", chain])
    out = json.loads(capsys.readouterr().out)
    assert out["n_samples"] > 10
    assert np.isfinite(out["max_loglikelihood"])

    sims = str(tmp_path / "sims.npz")
    main(["simulate", lc_file, "--kernel", "drw", "--chain", chain,
          "--nsims", "6", "--sigma-noise", "0.3", "--output", sims])
    out = json.loads(capsys.readouterr().out)
    data = np.load(sims)
    assert data["rates"].shape[0] == 6
    assert np.all(np.isfinite(data["rates"]))

    main(["lrt", lc_file, "--null", "drw", "--alt", "drw+qpo",
          "--nsims", "8", "--max-steps", "300", "--sim-steps", "80",
          "--sim-walkers", "8", "--sigma-noise", "0.3"])
    out = json.loads(capsys.readouterr().out)
    assert 0.0 <= out["p_value"] <= 1.0
    assert np.isfinite(out["t_obs"])


def test_cli_bad_kernel(lc_file):
    with pytest.raises(SystemExit):
        main(["fit", lc_file, "--kernel", "weird", "--max-steps", "100"])
