"""TaskServer: multi-task batched serving over a frozen state must agree
exactly with the reference-semantics predict() path (inference.py) for every
task, bucket size, and mixed-task routing order."""

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.inference import predict
from cpg_tpu.serve import TaskServer, _next_bucket
from cpg_tpu.train.manager import Manager
from cpg_tpu.train.sequence import init_state, start_task
from cpg_tpu.train.step import TrainConfig

from .helpers import norm_augment, normalize01, synthetic_task, tiny_cnn


def _two_task_state():
    d1, d2 = synthetic_task(0), synthetic_task(7, num_classes=3)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    for tid, d in ((1, d1), (2, d2)):
        start_task(state, f"t{tid}", d["num_classes"], jax.random.PRNGKey(tid))
        Manager(state, tiny_cnn, tid, d, cfg, batch_size=32,
                lr_schedule="constant", augment_fn=norm_augment,
                preprocess_fn=normalize01).train(epochs=2)
    return state, d1, d2


def test_bucket_sizes():
    assert _next_bucket(1, 8, 64) == 8
    assert _next_bucket(8, 8, 64) == 8
    assert _next_bucket(9, 8, 64) == 16
    assert _next_bucket(500, 8, 64) == 64  # capped; predict() then chunks


def test_server_matches_reference_predict():
    state, d1, d2 = _two_task_state()
    srv = TaskServer(state, preprocess_fn=normalize01,
                     compute_dtype=jnp.float32, min_bucket=8)
    for tid, d in ((1, d1), (2, d2)):
        for n in (3, 8, 13):  # padded, exact, multi-bucket
            x = d["test_x"][:n]
            got = srv.predict(tid, x)
            want = np.asarray(predict(state, tid,
                                      normalize01(jnp.asarray(x)),
                                      compute_dtype=jnp.float32))
            assert got.shape == (n, d["num_classes"])
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_mixed_task_routing_preserves_order():
    state, d1, d2 = _two_task_state()
    srv = TaskServer(state, preprocess_fn=normalize01,
                     compute_dtype=jnp.float32, min_bucket=8)
    reqs = [(1, d1["test_x"][0]), (2, d2["test_x"][0]),
            (1, d1["test_x"][1]), (2, d2["test_x"][1]),
            (2, d2["test_x"][2])]
    outs = srv.predict_mixed(reqs)
    assert len(outs) == 5
    for i, (tid, x) in enumerate(reqs):
        d = d1 if tid == 1 else d2
        assert outs[i].shape == (d["num_classes"],)
        want = srv.predict(tid, x[None])[0]
        np.testing.assert_allclose(outs[i], want, rtol=1e-6)


def test_warmup_compiles_all_tasks():
    state, *_ = _two_task_state()
    srv = TaskServer(state, preprocess_fn=normalize01,
                     compute_dtype=jnp.float32, min_bucket=8)
    srv.warmup()  # no raise = every task's view forwards end-to-end


def test_int8_quantized_serving_accuracy():
    """PTQ int8 serving: per-output-channel weight scales + dynamic
    activation scales must preserve task accuracy (trained tiny tasks) and
    track the float logits closely."""
    state, d1, d2 = _two_task_state()
    f32 = TaskServer(state, preprocess_fn=normalize01,
                     compute_dtype=jnp.float32, min_bucket=8)
    q8 = TaskServer(state, preprocess_fn=normalize01,
                    compute_dtype=jnp.float32, min_bucket=8, quantize="int8")
    # weights really are int8 on the serving path
    for w in q8._eff[1].values():
        assert w.dtype == jnp.int8
    for tid, d in ((1, d1), (2, d2)):
        x, y = d["test_x"][:64], d["test_y"][:64]
        lf = f32.predict(tid, x)
        lq = q8.predict(tid, x)
        acc_f = (lf.argmax(1) == y).mean()
        acc_q = (lq.argmax(1) == y).mean()
        assert acc_q >= acc_f - 0.05, (acc_f, acc_q)
        # logit agreement: top-1 match rate high even where logits drift
        agree = (lf.argmax(1) == lq.argmax(1)).mean()
        assert agree >= 0.9, agree


def test_export_load_serving_artifact(tmp_path):
    """The deployment artifact round-trip: export from a live server, load
    WITHOUT the training state, get byte-identical predictions (both float
    and int8-quantized servers)."""
    state, d1, d2 = _two_task_state()
    for quant in (None, "int8"):
        srv = TaskServer(state, preprocess_fn=normalize01,
                         compute_dtype=jnp.float32, min_bucket=8,
                         quantize=quant)
        p = srv.export(str(tmp_path / f"art_{quant}"))
        srv2 = TaskServer.load(p, preprocess_fn=normalize01, min_bucket=8)
        assert srv2.quantize == quant
        assert srv2.state.shared == {} and srv2.state.ownership == {}
        for tid, d in ((1, d1), (2, d2)):
            a = srv.predict(tid, d["test_x"][:16])
            b = srv2.predict(tid, d["test_x"][:16])
            np.testing.assert_array_equal(a, b)


def test_stats_cli(tmp_path):
    """`cpg_tpu stats` reports ownership/capacity from any checkpoint."""
    import contextlib
    import io
    import json

    from cpg_tpu.cli import main as cli_main
    from cpg_tpu.utils.checkpoint import save_state

    state, *_ = _two_task_state()
    p = save_state(state, str(tmp_path / "ck"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["stats", "--checkpoint", p, "--per-layer"])
    assert rc == 0
    rec = json.loads(buf.getvalue())
    assert rec["num_tasks"] == 2 and rec["arch"] == "tiny_cnn"
    owned = sum(t["owned_ratio"] for t in rec["tasks"].values())
    assert abs(owned + rec["free_ratio"] - 1.0) < 1e-6
    for layer in rec["layers"].values():
        assert abs(layer["free"] + layer["task1"] + layer["task2"] - 1.0) < 1e-6


def test_distributed_initialize_single_host_noop():
    """initialize() must degrade gracefully with no coordinator configured."""
    import jax

    from cpg_tpu.parallel.distributed import initialize

    initialize()  # no raise
    assert jax.process_count() >= 1


def test_export_cli(tmp_path):
    """`cpg_tpu export`: training checkpoint -> serving artifact -> served."""
    import contextlib
    import io
    import json

    from cpg_tpu.cli import main as cli_main
    from cpg_tpu.utils.checkpoint import save_state

    state, d1, _ = _two_task_state()
    ck = save_state(state, str(tmp_path / "ck"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["export", "--checkpoint", ck,
                       "--out", str(tmp_path / "art"), "--int8"])
    assert rc == 0
    rec = json.loads(buf.getvalue())
    assert rec["tasks"] == 2 and rec["quantize"] == "int8"
    srv = TaskServer.load(rec["artifact"], preprocess_fn=normalize01)
    y = srv.predict(1, d1["test_x"][:8])
    assert y.shape == (8, d1["num_classes"])


def test_distributed_initialize_configured_after_backend_raises():
    """With a coordinator EXPLICITLY configured but the XLA backend already
    initialized, initialize() must surface the ordering bug (RuntimeError)
    instead of silently training single-host per-host (ADVICE r2 #1)."""
    import pytest

    from cpg_tpu.parallel.distributed import initialize

    with pytest.raises(RuntimeError, match="before any JAX"):
        initialize(coordinator_address="127.0.0.1:1",
                   num_processes=2, process_id=0)


def test_lru_cache_matches_precompute_and_bounds_memory():
    """cache='lru' must return identical logits to precompute while holding
    at most max_cached tasks' effective weights resident (VERDICT r2 #9:
    precompute memory is O(tasks x model) — unbounded at many tasks)."""
    state, d1, d2 = _two_task_state()
    pre = TaskServer(state, preprocess_fn=normalize01,
                     compute_dtype=jnp.float32, min_bucket=8)
    lru = TaskServer(state, preprocess_fn=normalize01,
                     compute_dtype=jnp.float32, min_bucket=8,
                     cache="lru", max_cached=1)
    assert not lru._eff  # nothing materialized at load
    for tid, d in ((1, d1), (2, d2), (1, d1)):  # forces eviction + refill
        got = lru.predict(tid, d["test_x"][:5])
        want = pre.predict(tid, d["test_x"][:5])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        assert len(lru._eff) <= 1  # bounded: only the hot task resident

    # int8 path through lru: same answers as int8 precompute
    pre8 = TaskServer(state, preprocess_fn=normalize01, min_bucket=8,
                      quantize="int8")
    lru8 = TaskServer(state, preprocess_fn=normalize01, min_bucket=8,
                      quantize="int8", cache="lru", max_cached=1)
    for tid, d in ((1, d1), (2, d2)):
        np.testing.assert_allclose(lru8.predict(tid, d["test_x"][:5]),
                                   pre8.predict(tid, d["test_x"][:5]),
                                   rtol=1e-5, atol=1e-5)
        assert len(lru8._eff) <= 1 and len(lru8._scales) <= 1

    # export from an lru server still writes every task
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        lru.export(td)
        srv2 = TaskServer.load(td, preprocess_fn=normalize01)
        np.testing.assert_allclose(srv2.predict(2, d2["test_x"][:5]),
                                   pre.predict(2, d2["test_x"][:5]),
                                   rtol=1e-4, atol=1e-4)


def test_calibrated_int8_is_batching_invariant():
    """ADVICE r2 #3: dynamic int8 activation scales make a request's logits
    depend on co-batched traffic. calibrate() fixes static per-layer scales:
    identical inputs must give BIT-IDENTICAL logits whether served alone or
    next to an outlier request, accuracy stays close to bf16, and the scales
    survive export()/load()."""
    state, d1, d2 = _two_task_state()
    srv = TaskServer(state, preprocess_fn=normalize01, min_bucket=4,
                     quantize="int8")
    srv.calibrate({1: d1["train_x"][:64], 2: d2["train_x"][:64]})

    probe = d1["test_x"][:1]
    outlier = (d1["test_x"][1:2] * 0 + 255).astype(np.uint8)  # saturated row
    alone = srv.predict(1, probe)
    co_batched = srv.predict(1, np.concatenate([probe, outlier, outlier,
                                                outlier]))[:1]
    np.testing.assert_array_equal(alone, co_batched)

    # uncalibrated control: the same co-batching CAN shift logits (dynamic
    # scale tracks the outlier); we only require calibrated == invariant,
    # but sanity-check calibrated logits still track the bf16 reference
    ref = TaskServer(state, preprocess_fn=normalize01, min_bucket=4)
    np.testing.assert_allclose(alone, ref.predict(1, probe), rtol=0.2,
                               atol=0.5)
    agree = (np.argmax(alone, 1) == np.argmax(ref.predict(1, probe), 1))
    assert agree.all()

    # calibration scales ride through the deployment artifact
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        srv.export(td)
        srv2 = TaskServer.load(td, preprocess_fn=normalize01)
        assert srv2._act_scales[1], "act scales lost in export/load"
        np.testing.assert_array_equal(srv2.predict(1, probe), alone)


def test_serve_cli_offline_batch(tmp_path, monkeypatch):
    """export --int8 --calibrate -> serve --requests round-trip through the
    CLI: the deployment story end-to-end with no training stack at serve
    time (single-task and mixed-task routing modes)."""
    import contextlib
    import io
    import json

    import cpg_tpu.models as M
    from cpg_tpu.cli import main as cli_main
    from cpg_tpu.utils.checkpoint import save_state

    # cifar100 preprocess expects 32x32; register tiny_cnn under a 32px arch
    state, d1, d2 = _two_task_state()
    save_state(state, str(tmp_path / "ck"))
    np.savez(str(tmp_path / "calib.npz"), task1=d1["train_x"][:32],
             task2=d2["train_x"][:32])

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["export", "--checkpoint", str(tmp_path / "ck"),
                       "--out", str(tmp_path / "art"), "--int8",
                       "--calibrate", str(tmp_path / "calib.npz")])
    assert rc == 0
    rec = json.loads(buf.getvalue().strip())
    assert rec["quantize"] == "int8" and rec["calibrated_tasks"] == 2

    # single-task mode; tiny_cnn eats raw uint8 (normalize01 is the tests'
    # preprocess; the CLI applies the experiment's — patch it to ours)
    import cpg_tpu.data.augment as A

    monkeypatch.setattr(A, "cifar_eval_preprocess", normalize01)
    np.savez(str(tmp_path / "req.npz"), x=d1["test_x"][:10])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["serve", "--artifact", str(tmp_path / "art"),
                       "--requests", str(tmp_path / "req.npz"),
                       "--task-id", "1", "--out", str(tmp_path / "o1.npz")])
    assert rc == 0
    o1 = np.load(str(tmp_path / "o1.npz"))
    assert o1["logits"].shape == (10, d1["num_classes"])
    srv = TaskServer(state, preprocess_fn=normalize01, quantize="int8")
    srv.calibrate({1: d1["train_x"][:32], 2: d2["train_x"][:32]})
    np.testing.assert_array_equal(o1["pred"],
                                  np.argmax(srv.predict(1, d1["test_x"][:10]),
                                            1))

    # mixed-task routing mode
    np.savez(str(tmp_path / "req2.npz"),
             x=np.concatenate([d1["test_x"][:3], d2["test_x"][:3]]),
             task_ids=np.array([1, 1, 1, 2, 2, 2], np.int32))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["serve", "--artifact", str(tmp_path / "art"),
                       "--requests", str(tmp_path / "req2.npz"),
                       "--out", str(tmp_path / "o2.npz")])
    assert rc == 0
    o2 = np.load(str(tmp_path / "o2.npz"))
    assert list(o2["task_ids"]) == [1, 1, 1, 2, 2, 2]
    assert o2["logits_3"].shape == (d2["num_classes"],)


def test_mesh_server_matches_single_device():
    """TaskServer(mesh=...) shards request batches across the 8 virtual
    devices; logits must match the unmeshed server exactly, including padded
    buckets and the export/load round trip."""
    from cpg_tpu.parallel.mesh import make_mesh

    state, d1, d2 = _two_task_state()
    mesh = make_mesh()  # ('data', 8)
    plain = TaskServer(state, preprocess_fn=normalize01,
                       compute_dtype=jnp.float32, min_bucket=8)
    meshed = TaskServer(state, preprocess_fn=normalize01,
                        compute_dtype=jnp.float32, min_bucket=8, mesh=mesh)
    assert meshed.min_bucket == 8  # already a multiple of the mesh size
    for tid, d in ((1, d1), (2, d2)):
        for n in (3, 8, 13):  # padded, exact, multi-bucket
            got = meshed.predict(tid, d["test_x"][:n])
            want = plain.predict(tid, d["test_x"][:n])
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # sharded execution, not silent replication: the compiled fn's output
    # for a full bucket is laid out across devices
    y = meshed._fns[1](meshed._eff[1], None, None, state.tasks[1].private,
                       state.tasks[1].bn_state,
                       jnp.asarray(d1["test_x"][:8]))
    assert len(y.sharding.device_set) == 8


def test_mesh_server_load_roundtrip(tmp_path):
    from cpg_tpu.parallel.mesh import make_mesh

    state, d1, _ = _two_task_state()
    plain = TaskServer(state, preprocess_fn=normalize01,
                       compute_dtype=jnp.float32, min_bucket=8)
    path = plain.export(str(tmp_path / "art"))
    srv = TaskServer.load(path, preprocess_fn=normalize01,
                          mesh=make_mesh())
    np.testing.assert_allclose(srv.predict(1, d1["test_x"][:13]),
                               plain.predict(1, d1["test_x"][:13]),
                               rtol=1e-6, atol=1e-6)


def test_mesh_server_int8_matches():
    from cpg_tpu.parallel.mesh import make_mesh

    state, d1, _ = _two_task_state()
    plain = TaskServer(state, preprocess_fn=normalize01, quantize="int8",
                       compute_dtype=jnp.float32, min_bucket=8)
    meshed = TaskServer(state, preprocess_fn=normalize01, quantize="int8",
                        compute_dtype=jnp.float32, min_bucket=8,
                        mesh=make_mesh())
    np.testing.assert_allclose(meshed.predict(1, d1["test_x"][:13]),
                               plain.predict(1, d1["test_x"][:13]),
                               rtol=1e-5, atol=1e-5)


def test_lru_cache_thread_safety():
    """Concurrent predict() across tasks under an eviction-heavy LRU cache
    (max_cached=1) must neither crash nor corrupt results."""
    import concurrent.futures

    state, d1, d2 = _two_task_state()
    srv = TaskServer(state, preprocess_fn=normalize01,
                     compute_dtype=jnp.float32, min_bucket=8,
                     cache="lru", max_cached=1)
    want = {1: srv.predict(1, d1["test_x"][:8]),
            2: srv.predict(2, d2["test_x"][:8])}

    def hit(i):
        tid = 1 + (i % 2)
        d = d1 if tid == 1 else d2
        return tid, srv.predict(tid, d["test_x"][:8])

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        for tid, got in ex.map(hit, range(32)):
            np.testing.assert_allclose(got, want[tid], rtol=1e-5, atol=1e-5)
    assert len(srv._eff) <= 1


def test_dynamic_batcher_coalesces_and_matches():
    """Concurrent single-image submits within the window must produce (a)
    logits identical to direct predict, (b) FEWER device launches than
    requests."""
    import concurrent.futures

    from cpg_tpu.serve import DynamicBatcher

    state, d1, _ = _two_task_state()
    srv = TaskServer(state, preprocess_fn=normalize01,
                     compute_dtype=jnp.float32, min_bucket=8)
    want = srv.predict(1, d1["test_x"][:8])

    calls = []
    real = srv.predict
    srv.predict = lambda tid, x: (calls.append(len(x)), real(tid, x))[1]
    batcher = DynamicBatcher(srv, max_delay_ms=250)
    try:
        # warm the worker thread with one request outside the measurement
        batcher.predict(1, d1["test_x"][0])
        calls.clear()
        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
            futs = [ex.submit(batcher.predict, 1, d1["test_x"][i])
                    for i in range(8)]
            outs = [f.result(timeout=60) for f in futs]
        for i, y in enumerate(outs):
            np.testing.assert_allclose(y[0], want[i], rtol=1e-5, atol=1e-5)
        assert len(calls) < 8, calls  # coalesced (usually 1-2 launches)
        assert sum(calls) == 8
    finally:
        srv.predict = real
        batcher.close()


def test_dynamic_batcher_propagates_errors():
    from cpg_tpu.serve import DynamicBatcher

    state, d1, _ = _two_task_state()
    srv = TaskServer(state, preprocess_fn=normalize01,
                     compute_dtype=jnp.float32, min_bucket=8)
    batcher = DynamicBatcher(srv, max_delay_ms=1)
    try:
        import pytest

        with pytest.raises(KeyError):
            batcher.predict(99, d1["test_x"][0])  # unknown task
        # a bad shape fails inside the worker; future must carry it
        fut = batcher.submit(1, np.zeros((2, 5), np.uint8))
        with pytest.raises(Exception):
            fut.result(timeout=30)
    finally:
        batcher.close()


def test_compiler_options_passthrough(tmp_path):
    """TaskServer(compiler_options=...) reaches the jitted request-path
    executables (and survives export/load). CPU-safe flag here; on TPU the
    same surface carries xla_tpu_scoped_vmem_limit_kib — the measured +4.7%
    training-step lever (TrainConfig.compiler_options)."""
    state, d1, _ = _two_task_state()
    co = {"xla_llvm_disable_expensive_passes": True}
    srv = TaskServer(state, preprocess_fn=normalize01,
                     compute_dtype=jnp.float32, min_bucket=8,
                     compiler_options=co)
    x = d1["test_x"][:4]
    base = TaskServer(state, preprocess_fn=normalize01,
                      compute_dtype=jnp.float32, min_bucket=8)
    np.testing.assert_allclose(srv.predict(1, x), base.predict(1, x),
                               rtol=1e-5, atol=1e-5)
    p = srv.export(str(tmp_path / "art"))
    srv2 = TaskServer.load(p, preprocess_fn=normalize01, compiler_options=co)
    assert srv2.compiler_options == co
    np.testing.assert_allclose(srv2.predict(1, x), base.predict(1, x),
                               rtol=1e-5, atol=1e-5)


def test_export_load_bf16_artifact(tmp_path):
    """bf16 (the DEFAULT serving dtype) effective weights round-trip through
    export/load: np.savez writes bfloat16 as a raw |V2 void dtype that
    np.load cannot hand back to JAX — export stores uint16 bit patterns with
    the keys recorded in serving_meta. Regression: caught live driving the
    CLI export->serve flow (the f32/int8 tests missed it)."""
    state, d1, _ = _two_task_state()
    srv = TaskServer(state, preprocess_fn=normalize01,
                     compute_dtype=jnp.bfloat16, min_bucket=8)
    x = d1["test_x"][:4]
    want = srv.predict(1, x)
    p = srv.export(str(tmp_path / "art_bf16"))
    srv2 = TaskServer.load(p, preprocess_fn=normalize01)
    assert srv2._eff[1][next(iter(srv2._eff[1]))].dtype == jnp.bfloat16
    np.testing.assert_array_equal(srv2.predict(1, x), want)


def test_fused_chain_serving_matches_default():
    """TaskServer(fused_chain=True) routes bf16/f32 request forwards through
    the Pallas fused chain; logits must match the default server on a model
    with fused sites (tiny_vgg)."""
    from .test_fused_chain_step import tiny_vgg  # has fused_bn_relu_sconv

    state = init_state("tiny_vgg", jax.random.PRNGKey(0))
    d = synthetic_task(0, hw=8)
    start_task(state, "t1", d["num_classes"], jax.random.PRNGKey(1))
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    Manager(state, tiny_vgg, 1, d, cfg, batch_size=32,
            lr_schedule="constant", augment_fn=norm_augment,
            preprocess_fn=normalize01).train(epochs=1)
    x = d["test_x"][:10]
    srv0 = TaskServer(state, preprocess_fn=normalize01,
                      compute_dtype=jnp.float32, min_bucket=8)
    srv1 = TaskServer(state, preprocess_fn=normalize01,
                      compute_dtype=jnp.float32, min_bucket=8,
                      fused_chain=True)
    np.testing.assert_allclose(srv1.predict(1, x), srv0.predict(1, x),
                               rtol=1e-4, atol=1e-5)
