"""Supervised training of the ApproxMPC policy.

Re-design of ``do_mpc/approximateMPC/_trainer.py:38-506``: Adam + MSE with
train/val split and plateau LR scheduling, as a jit-compiled optax loop
(data-parallel ready: the train step is a pure function of (params, batch)).
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ._ampcsettings import TrainerSettings


class Trainer:
    def __init__(self, approx_mpc, settings: TrainerSettings | None = None):
        self.approx_mpc = approx_mpc
        self.settings = settings or TrainerSettings()
        self.history = {"train_loss": [], "val_loss": [], "lr": [],
                        "update_norm": []}

    def default_training(self, X, U, U_prev=None, seed=0):
        """Train on (x0[, u_prev]) -> u_opt pairs; returns history."""
        st = self.settings
        am = self.approx_mpc
        if am.use_u_prev:
            assert U_prev is not None
            inputs = np.concatenate([X, U_prev], axis=1)
        else:
            inputs = X
        Xs = am.scale_inputs(inputs)
        Ys = (U - am.out_shift) / am.out_range

        n = Xs.shape[0]
        rng = np.random.default_rng(seed)
        perm = rng.permutation(n)
        n_train = int(st.train_split * n)
        tr, va = perm[:n_train], perm[n_train:]
        Xtr, Ytr = jnp.asarray(Xs[tr]), jnp.asarray(Ys[tr])
        Xva, Yva = jnp.asarray(Xs[va]), jnp.asarray(Ys[va])

        opt = optax.adam(st.learning_rate)
        opt_state = opt.init(am.params)
        params = am.params

        def loss_fn(params, xb, yb):
            pred = am.net.apply(params, xb)
            return jnp.mean((pred - yb) ** 2)

        @jax.jit
        def train_step(params, opt_state, xb, yb, lr_mult):
            loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb)
            updates, opt_state = opt.update(grads, opt_state, params)
            # plateau LR scheduling: scale the POST-Adam update.  Adam's
            # step is invariant to uniform gradient scaling (m/sqrt(v)
            # cancels the factor), so scaling gradients would be a no-op;
            # scaling the update is exactly learning-rate scaling.
            updates = jax.tree.map(lambda u: u * lr_mult, updates)
            params = optax.apply_updates(params, updates)
            upd_norm = optax.global_norm(updates)
            return params, opt_state, loss, upd_norm

        # Data-parallel over all visible devices: replicate (params,
        # opt_state), shard each batch's leading axis on a 1-D "data"
        # mesh.  The mean-loss gradient then contains a cross-shard sum,
        # which XLA lowers to an all-reduce over ICI — the pmap-free SPMD
        # idiom (reference parity: the torch Trainer is single-device,
        # do_mpc/approximateMPC/_trainer.py).
        self._mesh = None
        batch_sharding = None
        if st.data_parallel and jax.device_count() > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec
            n_dev = jax.device_count()
            self._mesh = Mesh(np.array(jax.devices()), ("data",))
            batch_sharding = NamedSharding(self._mesh,
                                           PartitionSpec("data"))
            replicated = NamedSharding(self._mesh, PartitionSpec())
            params = jax.device_put(params, replicated)
            opt_state = jax.device_put(opt_state, replicated)

        warned_unsharded = [False]

        def _put(xb, yb):
            if batch_sharding is not None:
                if xb.shape[0] % self._mesh.devices.size == 0:
                    xb = jax.device_put(xb, batch_sharding)
                    yb = jax.device_put(yb, batch_sharding)
                elif not warned_unsharded[0]:
                    # data_parallel requested but this batch cannot shard
                    # evenly — it runs unsharded; surface it once instead
                    # of silently training single-device
                    warned_unsharded[0] = True
                    import warnings as _warnings
                    _warnings.warn(
                        f"data_parallel=True but batch size {xb.shape[0]}"
                        f" is not divisible by the device count "
                        f"{self._mesh.devices.size}; this (and any "
                        "further such) batch runs unsharded. Choose "
                        "batch_size as a multiple of the device count.")
            return xb, yb

        val_loss_fn = jax.jit(loss_fn)
        best_val = np.inf
        patience = 0
        lr_mult = 1.0
        bs = st.batch_size
        steps_per_epoch = max(1, len(tr) // bs)
        for epoch in range(st.n_epochs):
            if st.shuffle:
                order = rng.permutation(len(tr))
                Xtr = Xtr[jnp.asarray(order)]
                Ytr = Ytr[jnp.asarray(order)]
            ep_loss = 0.0
            ep_norm = 0.0
            for i in range(steps_per_epoch):
                xb = Xtr[i * bs:(i + 1) * bs]
                yb = Ytr[i * bs:(i + 1) * bs]
                xb, yb = _put(xb, yb)
                params, opt_state, loss, upd_norm = train_step(
                    params, opt_state, xb, yb, jnp.asarray(lr_mult))
                ep_loss += float(loss)
                ep_norm += float(upd_norm)
            ep_loss /= steps_per_epoch
            ep_norm /= steps_per_epoch
            val = float(val_loss_fn(params, Xva, Yva)) if len(va) else ep_loss
            self.history["train_loss"].append(ep_loss)
            self.history["val_loss"].append(val)
            self.history["lr"].append(lr_mult * st.learning_rate)
            self.history["update_norm"].append(ep_norm)
            if st.scheduler_flag:
                if val < best_val - 1e-12:
                    best_val = val
                    patience = 0
                else:
                    patience += 1
                    if patience >= st.scheduler_patience:
                        lr_mult *= st.scheduler_factor
                        patience = 0
            if st.print_frequency and epoch % st.print_frequency == 0:
                print(f"epoch {epoch}: train {ep_loss:.3e} val {val:.3e}")
        self.approx_mpc.params = params
        if st.save_history:
            os.makedirs(st.results_dir, exist_ok=True)
            np.savez(os.path.join(st.results_dir, "history.npz"),
                     **{k: np.asarray(v) for k, v in self.history.items()})
        return self.history

    def plot_history(self, save_fig=False, fig_name="training_history.png"):
        """Loss/LR curves over epochs (reference:
        do_mpc/approximateMPC/_trainer.py:295-382, ``visualize_training``).

        Returns (fig, ax) so callers can restyle; with ``save_fig`` the
        figure is written to ``settings.results_dir``."""
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(2, 1, sharex=True, figsize=(7, 5))
        epochs = np.arange(len(self.history["train_loss"]))
        ax[0].semilogy(epochs, self.history["train_loss"],
                       label="train loss")
        if any(v is not None for v in self.history["val_loss"]):
            ax[0].semilogy(epochs, self.history["val_loss"],
                           label="val loss")
        ax[0].set_ylabel("MSE loss")
        ax[0].legend()
        ax[1].semilogy(epochs, self.history["lr"], label="learning rate")
        ax[1].set_ylabel("learning rate")
        ax[1].set_xlabel("epoch")
        ax[1].legend()
        fig.tight_layout()
        if save_fig:
            os.makedirs(self.settings.results_dir, exist_ok=True)
            fig.savefig(os.path.join(self.settings.results_dir, fig_name))
        return fig, ax
