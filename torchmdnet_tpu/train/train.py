"""``tmdnet-train`` CLI (reference ``torchmdnet/scripts/train.py:182-279``):
config → DataModule → priors → model → Trainer.fit → test on best ckpt."""

import os


def main(argv=None):
    import numpy as np

    from torchmdnet_tpu.data.datamodule import DataModule
    from torchmdnet_tpu.models.model import create_model, create_prior_models
    from torchmdnet_tpu.train.trainer import Trainer
    from torchmdnet_tpu.utils.config import get_args

    args = get_args(argv)
    from torchmdnet_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    hp = vars(args)
    # write the fully-resolved config next to the logs (reference
    # scripts/train.py:153 `save_argparse(args, input.yaml)`)
    if hp.get("log_dir"):
        from torchmdnet_tpu.utils.config import save_argparse

        os.makedirs(hp["log_dir"], exist_ok=True)
        save_argparse(
            args, os.path.join(hp["log_dir"], "input.yaml"),
            exclude=["conf"],
        )
    if int(hp.get("num_nodes", 1) or 1) > 1:
        # multi-host rendezvous (replaces the reference's NODE_RANK/
        # MASTER_ADDR NCCL setup, README.md:121-144)
        import jax

        jax.distributed.initialize()
    np.random.seed(hp.get("seed", 1))

    data = DataModule(hp)
    data.setup("fit")

    prior_models = create_prior_models(hp, data.dataset)

    mean, std = data.mean, data.std
    if hp.get("remove_ref_energy"):
        # delta learning: trailing disabled Atomref (reference train.py:198)
        from torchmdnet_tpu.priors.atomref import Atomref

        atomref = data.atomref
        prior_models = tuple(prior_models) + (
            Atomref(initial_atomref=atomref, enable=False),
        )

    if hp.get("load_model"):
        from torchmdnet_tpu.models.model import load_model

        potential, variables = load_model(hp["load_model"], args=hp)
        trainer = Trainer(potential, hp, data)
        first = next(iter(data.train_dataloader()))
        trainer._init_state(first)
        import jax
        import jax.numpy as jnp

        trainer.state = trainer.state._replace(
            params=jax.tree.map(jnp.asarray, variables["params"])
        )
        # exact resume (optimizer state, step, plateau LR) from the native
        # sidecar, unless --reset-trainer (reference scripts/train.py:50)
        sidecar = str(hp["load_model"]) + ".native"
        if os.path.exists(sidecar) and not hp.get("reset_trainer"):
            import pickle

            with open(sidecar, "rb") as fh:
                saved = pickle.load(fh)
            trainer.state = trainer.state._replace(
                opt_state=jax.tree.map(jnp.asarray, saved["opt_state"]),
                step=jnp.asarray(saved["step"], jnp.int32),
                base_lr=jnp.asarray(saved["base_lr"], jnp.float32),
            )
    else:
        potential = create_model(hp, prior_models=prior_models,
                                 mean=mean, std=std)
        trainer = Trainer(potential, hp, data)

    trainer.fit()

    # post-fit: test with the best checkpoint's params (reference :271-279)
    best = os.path.join(hp["log_dir"], "best.ckpt.native")
    if os.path.exists(best):
        import pickle

        import jax
        import jax.numpy as jnp

        with open(best, "rb") as fh:
            saved = pickle.load(fh)
        trainer.state = trainer.state._replace(
            params=jax.tree.map(jnp.asarray, saved["params"])
        )
    results = trainer.test()
    print("test results:", results)
    return results


if __name__ == "__main__":
    main()
