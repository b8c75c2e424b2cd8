"""2-process CPU smoke test of the jax.distributed multi-host path.

Each subprocess initializes the distributed runtime with 2 virtual CPU
devices, so the global mesh spans 2 processes x 2 devices; the smoke
check all-gathers process ids across DCN-analog (grpc) and psums a
walker-sharded vector over the global mesh via shard_map.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import json, sys
coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
sys.path.insert(0, {repo!r})
from lumfuncmcmc_tpu.parallel.distributed import init_distributed, smoke_check
import jax
jax.config.update("jax_platforms", "cpu")
init_distributed(coord, nproc, pid, local_device_count=2)
print("SMOKE" + json.dumps(smoke_check()), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_pair(child, extra_args, env, timeout=420, cwds=None):
    """Launch the 2-process job; returns the two stdouts."""
    coord = f"127.0.0.1:{_free_port()}"
    procs = [subprocess.Popen(
        [sys.executable, "-c", child, coord, "2", str(pid)] + extra_args,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        text=True, cwd=None if cwds is None else cwds[pid])
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed job timed out")
        assert p.returncode == 0, err[-3000:]
        outs.append(out)
    return outs


# run_stretch over a GLOBAL 2-process mesh on the real likelihood; the
# gathered chain must match the single-process run bit-for-bit (walker
# sharding does not change any reduction: sources stay local)
_CHAIN_CHILD = r"""
import sys
coord, nproc, pid, outpath = (sys.argv[1], int(sys.argv[2]),
                              int(sys.argv[3]), sys.argv[4])
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from lumfuncmcmc_tpu.parallel.distributed import init_distributed, to_host
init_distributed(coord, nproc, pid, local_device_count=2)
import numpy as np
from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.context import build_context
from lumfuncmcmc_tpu.models.likelihood import ThetaLayout, sample_init
from lumfuncmcmc_tpu.parallel.mesh import make_mesh
from lumfuncmcmc_tpu.parallel.sharding import make_lnprob_sharded
from lumfuncmcmc_tpu.samplers.affine import run_stretch
from lumfuncmcmc_tpu.utils.synth import make_catalog, apply_completeness_cut

assert jax.process_count() == 2 and jax.device_count() == 4
cfg = LFConfig(min_comp_frac=0.5, size_ln=21)
cat = apply_completeness_cut(make_catalog(cfg, n_target=120, seed=12), cfg)
_, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                       flux_e=cat["flux_e"], field_id=cat["field_id"])
layout = ThetaLayout.from_config(cfg)
mesh = make_mesh(4, 1)   # spans both processes
lnprob = make_lnprob_sharded(ctx, layout, mesh)
pos0 = np.asarray(sample_init(jax.random.PRNGKey(0), layout, 16))
key = np.asarray(jax.random.PRNGKey(1))
state, chain, lnps, acc = run_stretch(lnprob, pos0, key, 50)
chain, lnps = to_host(chain), to_host(lnps)
if jax.process_index() == 0:
    np.savez(outpath, chain=chain, lnps=lnps)
print("CHAINDONE", flush=True)
"""


@pytest.mark.slow
def test_two_process_sampling_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = _CHAIN_CHILD.format(repo=repo)
    outpath = str(tmp_path / "dist_chain.npz")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    outs = _run_pair(child, [outpath], env)
    for out in outs:
        assert "CHAINDONE" in out, out

    # same-seed single-process reference in THIS process (8 local
    # devices, unsharded vmap)
    import numpy as np
    import jax
    from lumfuncmcmc_tpu.config import LFConfig
    from lumfuncmcmc_tpu.models.context import build_context
    from lumfuncmcmc_tpu.models.likelihood import (
        ThetaLayout, make_lnprob, sample_init)
    from lumfuncmcmc_tpu.samplers.affine import run_stretch
    from lumfuncmcmc_tpu.utils.synth import (
        make_catalog, apply_completeness_cut)

    cfg = LFConfig(min_comp_frac=0.5, size_ln=21)
    cat = apply_completeness_cut(make_catalog(cfg, n_target=120, seed=12),
                                 cfg)
    _, ctx = build_context(cfg, z=cat["z"], flux=cat["flux"],
                           flux_e=cat["flux_e"],
                           field_id=cat["field_id"])
    layout = ThetaLayout.from_config(cfg)
    pos0 = np.asarray(sample_init(jax.random.PRNGKey(0), layout, 16))
    _, chain, lnps, _ = run_stretch(
        jax.vmap(make_lnprob(ctx, layout)), pos0,
        np.asarray(jax.random.PRNGKey(1)), 50)
    got = np.load(outpath)
    assert got["chain"].shape == (50, 16, layout.ndim)
    np.testing.assert_allclose(got["chain"], np.asarray(chain),
                               rtol=1e-12, atol=0)
    np.testing.assert_allclose(got["lnps"], np.asarray(lnps),
                               rtol=1e-12, atol=0)


# drive the CLI --distributed flag end to end: both processes cooperate
# on one chain, process 0 writes the artifacts
_CLI_CHILD = r"""
import sys
coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
from lumfuncmcmc_tpu.cli.main import main
rc = main(["fit", "--synthetic", "150", "-ns", "40", "-nw", "16",
           "-mcf", "0.5", "--size-ln", "21", "-o", "dist.dat",
           "--evidence", "4", "--evidence-swap", "10",
           "--evidence-tune", "1",
           "--distributed", coord + "," + str(nproc) + "," + str(pid)])
print("CLIRC", rc, flush=True)
"""


@pytest.mark.slow
def test_cli_distributed_end_to_end(tmp_path, monkeypatch):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = _CLI_CHILD.format(repo=repo)
    shared = tmp_path / "shared"
    shared.mkdir()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    outs = _run_pair(child, [], env, cwds=[str(shared), str(shared)])
    assert "CLIRC 0" in outs[0], outs[0]
    assert "CLIRC 0" in outs[1], outs[1]
    assert "Non-primary process: artifacts written by process 0" in \
        "".join(outs)
    outdir = shared / "LFMCMCOut"
    post = list(outdir.glob("fitposterior_*.dat"))
    assert post, list(outdir.iterdir())
    # --evidence is a COLLECTIVE (ladder shard_map over the global
    # mesh + to_host): both processes must run it, process 0 writes.
    # A primary-only ladder deadlocks this test at the 420 s timeout.
    assert list(outdir.glob("evidence_*.dat")), list(outdir.iterdir())

    # the same CLI run without --distributed (this process, 8 local
    # devices) produces the same chain: walker sharding is math-neutral
    solo = tmp_path / "solo"
    solo.mkdir()
    monkeypatch.chdir(solo)
    from lumfuncmcmc_tpu.cli.main import main
    rc = main(["fit", "--synthetic", "150", "-ns", "40", "-nw", "16",
               "-mcf", "0.5", "--size-ln", "21", "-o", "dist.dat"])
    assert rc == 0
    from lumfuncmcmc_tpu.utils.io import read_fixed_width_two_line
    a = read_fixed_width_two_line(str(post[0]))
    b = read_fixed_width_two_line(
        str(next((solo / "LFMCMCOut").glob("fitposterior_*.dat"))))
    import numpy as np
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k], dtype=float),
                                   np.asarray(b[k], dtype=float),
                                   rtol=1e-8, atol=1e-10)


@pytest.mark.slow
def test_two_process_distributed_smoke(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = _CHILD.format(repo=repo)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children set their own device count

    procs = [subprocess.Popen(
        [sys.executable, "-c", child, coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed smoke timed out")
        assert p.returncode == 0, err[-2000:]
        outs.append(out)

    for pid, out in enumerate(outs):
        line = [ln for ln in out.splitlines() if ln.startswith("SMOKE")]
        assert line, out
        facts = json.loads(line[0][len("SMOKE"):])
        assert facts["process_index"] == pid
        assert facts["process_count"] == 2
        assert facts["device_count"] == 4
        assert facts["local_device_count"] == 2
        assert facts["gathered_pids"] == [0, 1]
        assert facts["psum_total"] == 4.0


# NUTS over a GLOBAL 2-process mesh with min-ess block checkpointing:
# the full run, a truncated run, and a resume must all cooperate across
# processes (collective gathers before the primary-only npz write) and
# the resumed chain must equal the uninterrupted one
_NUTS_CHILD = r"""
import sys
coord, nproc, pid, shared = (sys.argv[1], int(sys.argv[2]),
                             int(sys.argv[3]), sys.argv[4])
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from lumfuncmcmc_tpu.parallel.distributed import init_distributed
init_distributed(coord, nproc, pid, local_device_count=2)
import numpy as np
from lumfuncmcmc_tpu.config import LFConfig
from lumfuncmcmc_tpu.models.model import LumFuncModel
from lumfuncmcmc_tpu.parallel.mesh import make_mesh
from lumfuncmcmc_tpu.utils.synth import make_catalog, apply_completeness_cut

assert jax.process_count() == 2 and jax.device_count() == 4
cfg = LFConfig(min_comp_frac=0.5, fix_comp=True, size_ln=21,
               nwalkers=8, nsteps=6, seed=5)
cat = apply_completeness_cut(make_catalog(cfg, n_target=120, seed=12),
                             cfg)
kw = dict(z=cat["z"], flux=cat["flux"], flux_e=cat["flux_e"],
          field_id=cat["field_id"])

def model():
    return LumFuncModel(cfg, mesh=make_mesh(4, 1), **kw)

ck = shared + "/nuts_dist.npz"
full = model().fit_model_nuts(num_warmup=30, nchains=4, min_ess=1e6,
                              max_blocks=2, checkpoint_path=ck)
ck2 = shared + "/nuts_dist2.npz"
model().fit_model_nuts(num_warmup=30, nchains=4, min_ess=1e6,
                       max_blocks=1, checkpoint_path=ck2)
resumed = model().fit_model_nuts(num_warmup=30, nchains=4, min_ess=1e6,
                                 max_blocks=2, checkpoint_path=ck2,
                                 resume=True)
assert np.array_equal(resumed, full), "resume != uninterrupted"
if pid == 0:
    assert int(np.load(ck)["nblocks"]) == 2
    np.save(shared + "/full.npy", full)
print("NUTSCKPTDONE", flush=True)
"""


@pytest.mark.slow
def test_two_process_nuts_min_ess_checkpoint(tmp_path):
    """Multi-process NUTS with --min-ess checkpoints: both processes
    run the collective gathers, only process 0 writes the npz, and the
    cross-process resume reproduces the uninterrupted chain exactly.
    Also pins multi-process NUTS end-to-end at all (the gather of the
    global-mesh-sharded samples for the host-side conversions)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = _NUTS_CHILD.format(repo=repo)
    shared = tmp_path / "shared"
    shared.mkdir()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    outs = _run_pair(child, [str(shared)], env, timeout=560)
    for out in outs:
        assert "NUTSCKPTDONE" in out, out
    import numpy as np
    full = np.load(str(shared / "full.npy"))
    assert full.shape[1] >= 4 and np.all(np.isfinite(full))
    # 2 blocks x 6 samples x 4 chains
    assert full.shape[0] == 2 * 6 * 4
