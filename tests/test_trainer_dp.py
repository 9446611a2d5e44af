"""Data-parallel policy training (SURVEY §2.3 "NN training DP"): batches
sharded over the 8-device CPU mesh with replicated params must reproduce
the single-device training trajectory (same arithmetic; XLA inserts the
gradient all-reduce)."""
import numpy as np

import dompc_tpu as dm
import systems


def _train(data_parallel):
    model = systems.oscillating_masses_model()
    mpc = systems.oscillating_masses_mpc(model)
    approx = dm.approximateMPC.ApproxMPC(mpc)
    settings = dm.approximateMPC.TrainerSettings(
        n_epochs=30, batch_size=64, learning_rate=3e-3,
        print_frequency=0, shuffle=False, data_parallel=data_parallel)
    trainer = dm.approximateMPC.Trainer(approx, settings)

    rng = np.random.default_rng(0)
    X = rng.uniform(-1.0, 1.0, (256, 4))
    U_prev = rng.uniform(-0.4, 0.4, (256, 1))
    U = np.clip(-0.3 * X[:, :1] + 0.1 * U_prev, -0.5, 0.5)
    hist = trainer.default_training(X, U, U_prev=U_prev, seed=0)
    return hist, trainer, approx


def test_plateau_scheduler_shrinks_updates():
    """The ReduceLROnPlateau scheduler must actually shrink the parameter
    update norm (r3 regression: gradient pre-scaling was a no-op under
    Adam; the fix scales the post-Adam update)."""
    model = systems.oscillating_masses_model()
    mpc = systems.oscillating_masses_mpc(model)
    approx = dm.approximateMPC.ApproxMPC(mpc)
    settings = dm.approximateMPC.TrainerSettings(
        n_epochs=24, batch_size=64, learning_rate=3e-3,
        print_frequency=0, shuffle=False, data_parallel=False,
        scheduler_flag=True, scheduler_patience=2, scheduler_factor=0.1)
    trainer = dm.approximateMPC.Trainer(approx, settings)

    rng = np.random.default_rng(1)
    X = rng.uniform(-1.0, 1.0, (256, 4))
    U_prev = rng.uniform(-0.4, 0.4, (256, 1))
    # pure-noise targets: the val loss plateaus almost immediately, so
    # the scheduler fires several times
    U = rng.uniform(-0.5, 0.5, (256, 1))
    hist = trainer.default_training(X, U, U_prev=U_prev, seed=0)

    # reference-parity history plot (visualize_training)
    import matplotlib
    matplotlib.use("Agg")
    fig, ax = trainer.plot_history()
    assert len(ax) == 2
    import matplotlib.pyplot as plt
    plt.close(fig)

    lr = np.asarray(hist["lr"])
    norms = np.asarray(hist["update_norm"])
    assert lr[-1] < 0.2 * lr[0], "scheduler never engaged"
    # each decade of LR decay must show up as ~a decade of update-norm
    # decay (Adam's normalized step makes update_norm ~ lr * sqrt(n))
    drop_epochs = np.nonzero(lr[1:] < lr[:-1])[0] + 1
    e0 = drop_epochs[0]
    before = norms[:e0].mean()
    after = norms[-3:].mean()
    assert after < 0.05 * before, (
        f"update norm did not shrink with LR: {before:.2e} -> {after:.2e}")
    # lr history must track the multiplier, not stay constant
    assert lr.min() < lr.max()


def test_data_parallel_matches_single_device():
    import jax
    assert jax.device_count() == 8  # conftest virtual CPU mesh

    hist_dp, trainer_dp, approx_dp = _train(True)
    hist_sd, trainer_sd, approx_sd = _train(False)

    assert trainer_dp._mesh is not None, "mesh not engaged"
    assert trainer_sd._mesh is None

    assert hist_dp["train_loss"][-1] < hist_dp["train_loss"][0]
    # same arithmetic up to cross-shard reduction order (f64)
    np.testing.assert_allclose(hist_dp["train_loss"][-1],
                               hist_sd["train_loss"][-1],
                               rtol=1e-8, atol=1e-12)
    for a, b in zip(jax.tree.leaves(approx_dp.params),
                    jax.tree.leaves(approx_sd.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-10)
