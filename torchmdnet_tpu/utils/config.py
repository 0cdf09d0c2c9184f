"""Config/flag system (reference ``torchmdnet/scripts/train.py:34-155`` +
``torchmdnet/utils.py:269-327``): the same ~70 flags, YAML config merge with
unknown-key hard errors and CLI precedence, resolved-config persistence as
``input.yaml``, and checkpoint-hparams restart."""

import argparse
import os

import yaml


def number(text):
    """int, float, or None from CLI/YAML (reference ``utils.py:330-346``)."""
    if text is None or text == "None":
        return None
    try:
        return int(text)
    except ValueError:
        return float(text)


class LoadFromFile(argparse.Action):
    """--conf file.yaml: YAML values become defaults; unknown keys error;
    CLI args win (reference ``utils.py:269-291``)."""

    def __call__(self, parser, namespace, values, option_string=None):
        if values.name.endswith("yaml") or values.name.endswith("yml"):
            with values as f:
                config = yaml.safe_load(f)
            for key in config.keys():
                if key not in namespace:
                    raise ValueError(f"Unknown argument in config file: {key}")
            if (
                "load_model" in config
                and namespace.load_model is not None
                and config["load_model"] != namespace.load_model
            ):
                raise ValueError(
                    "Cannot use load_model in the config file and the "
                    "command line at the same time."
                )
            namespace.__dict__.update(config)
        else:
            raise ValueError("Configuration file must end with yaml or yml")


class LoadFromCheckpoint(argparse.Action):
    """--load-model ckpt: pull hparams from the checkpoint sidecar/embedded
    hyper_parameters (reference ``utils.py:294-309``)."""

    def __call__(self, parser, namespace, values, option_string=None):
        hparams_path = os.path.join(os.path.dirname(values), "hparams.yaml")
        if os.path.exists(hparams_path):
            with open(hparams_path) as f:
                config = yaml.safe_load(f)
        else:
            from torchmdnet_tpu.utils.torch_ckpt import read_torch_checkpoint

            config, _ = read_torch_checkpoint(values)
        for key in list(config.keys()):
            if key not in namespace:
                config.pop(key)
        namespace.__dict__.update(config)
        namespace.load_model = values


def save_argparse(args, filename, exclude=None):
    """Persist the resolved config (reference ``utils.py:312-327``)."""
    assert filename.endswith("yaml") or filename.endswith("yml")
    if isinstance(exclude, str):
        exclude = [exclude]
    args = {k: v for k, v in vars(args).items() if k not in (exclude or [])}
    with open(filename, "w") as fout:
        yaml.dump(args, fout)


def get_argparse():
    from torchmdnet_tpu import models as models_pkg
    from torchmdnet_tpu.datasets import __all__ as dataset_names
    from torchmdnet_tpu.models.common import ACTIVATIONS, RBF_CLASSES
    from torchmdnet_tpu.models.output_modules import OUTPUT_MODULES
    from torchmdnet_tpu.train.loss import LOSS_FUNCTIONS

    # fmt: off
    parser = argparse.ArgumentParser(description="Training")
    parser.add_argument('--load-model', action=LoadFromCheckpoint, help='Restart training using a model checkpoint')
    parser.add_argument('--conf', '-c', type=open, action=LoadFromFile, help='Configuration yaml file')
    parser.add_argument('--num-epochs', default=300, type=int)
    parser.add_argument('--batch-size', default=32, type=int)
    parser.add_argument('--inference-batch-size', default=None, type=int)
    parser.add_argument('--lr', default=1e-4, type=float)
    parser.add_argument('--lr-patience', type=int, default=10)
    parser.add_argument('--lr-metric', type=str, default='val', choices=['train', 'val'])
    parser.add_argument('--lr-min', type=float, default=1e-6)
    parser.add_argument('--lr-factor', type=float, default=0.8)
    parser.add_argument('--lr-warmup-steps', type=int, default=0)
    parser.add_argument('--early-stopping-patience', type=int, default=30)
    parser.add_argument('--early-stopping-monitor', type=str, default='val_total_mse_loss')
    parser.add_argument('--reset-trainer', type=bool, default=False)
    parser.add_argument('--weight-decay', type=float, default=0.0)
    parser.add_argument('--ema-alpha-y', type=float, default=1.0)
    parser.add_argument('--ema-alpha-neg-dy', type=float, default=1.0)
    parser.add_argument('--ngpus', type=int, default=-1, help='Number of devices; -1 uses all available')
    parser.add_argument('--num-nodes', type=int, default=1, help='Number of hosts (jax.distributed)')
    parser.add_argument('--precision', type=int, default=32, choices=[16, 32, 64])
    parser.add_argument('--matmul-precision', type=str, default='highest', choices=['highest', 'high', 'default'], help='MXU pass count for f32 matmuls (highest = f32-exact)')
    parser.add_argument('--log-dir', '-l', default='/tmp/logs')
    parser.add_argument('--splits', default=None)
    parser.add_argument('--train-size', type=number, default=None)
    parser.add_argument('--val-size', type=number, default=0.05)
    parser.add_argument('--test-size', type=number, default=0.1)
    parser.add_argument('--test-interval', type=int, default=-1)
    parser.add_argument('--save-interval', type=int, default=10)
    parser.add_argument('--seed', type=int, default=1)
    parser.add_argument('--num-workers', type=int, default=4)
    parser.add_argument('--redirect', type=bool, default=False)
    parser.add_argument('--gradient-clipping', type=float, default=0.0)
    parser.add_argument('--remove-ref-energy', action='store_true')
    parser.add_argument('--checkpoint-monitor', type=str, default='val_total_mse_loss')
    parser.add_argument('--load-weights', default=None, type=str)
    # dataset specific
    parser.add_argument('--dataset', default=None, type=str, choices=dataset_names)
    parser.add_argument('--dataset-root', default='~/data', type=str)
    parser.add_argument('--dataset-arg', default=None)
    parser.add_argument('--coord-files', default=None, type=str)
    parser.add_argument('--embed-files', default=None, type=str)
    parser.add_argument('--energy-files', default=None, type=str)
    parser.add_argument('--force-files', default=None, type=str)
    parser.add_argument('--dataset-preload-limit', default=1024, type=int)
    parser.add_argument('--max-num-atoms-per-batch', default=None, type=int, help='Static atom capacity of a padded batch (TPU); default = batch_size × largest molecule')
    parser.add_argument('--y-weight', default=1.0, type=float)
    parser.add_argument('--neg-dy-weight', default=1.0, type=float)
    parser.add_argument('--train-loss', default='mse_loss', type=str, choices=list(LOSS_FUNCTIONS))
    parser.add_argument('--train-loss-arg', default=None)
    # model architecture
    parser.add_argument('--model', type=str, default='graph-network', choices=models_pkg.__all_models__)
    parser.add_argument('--output-model', type=str, default='Scalar', choices=list(OUTPUT_MODULES))
    parser.add_argument('--output-mlp-num-layers', type=int, default=0)
    parser.add_argument('--prior-model', type=str, default=None, action="extend", nargs="*")
    parser.add_argument('--prior-args', default=None)
    # architectural args
    parser.add_argument('--charge', type=bool, default=False)
    parser.add_argument('--spin', type=bool, default=False)
    parser.add_argument('--embedding-dimension', type=int, default=256)
    parser.add_argument('--num-layers', type=int, default=6)
    parser.add_argument('--num-rbf', type=int, default=64)
    parser.add_argument('--activation', type=str, default='silu', choices=list(ACTIVATIONS))
    parser.add_argument('--rbf-type', type=str, default='expnorm', choices=list(RBF_CLASSES))
    parser.add_argument('--trainable-rbf', type=bool, default=False)
    parser.add_argument('--neighbor-embedding', type=bool, default=False)
    parser.add_argument('--aggr', type=str, default='add')
    # transformer specific
    parser.add_argument('--distance-influence', type=str, default='both', choices=['keys', 'values', 'both', 'none'])
    parser.add_argument('--attn-activation', default='silu', choices=list(ACTIVATIONS))
    parser.add_argument('--num-heads', type=int, default=8)
    # ET specific
    parser.add_argument('--vector-cutoff', type=bool, default=False)
    # TensorNet specific
    parser.add_argument('--equivariance-invariance-group', type=str, default='O(3)')
    parser.add_argument('--box-vecs', type=lambda x: list(yaml.safe_load(x)), default=None)
    parser.add_argument('--static_shapes', type=bool, default=True)
    # TensorNet2 / Coulomb output specific
    parser.add_argument('--q-dim', type=int, default=0)
    parser.add_argument('--q-weights', default=None)
    parser.add_argument('--coulomb-cutoff', type=number, default=None)
    parser.add_argument('--coulomb-max-num-neighbors', type=int, default=None)
    parser.add_argument('--coulomb-neighbor-strategy', type=str, default='brute')
    parser.add_argument('--coulomb-cells-per-dim', type=int, nargs=3,
                        default=None,
                        help='static cell grid for the Coulomb-head cell '
                             'strategy under jit')
    parser.add_argument('--coulomb-cell-capacity', type=int, default=64)
    # TPU performance knobs (this framework's extensions; all default to
    # the reference-equivalent exact paths)
    parser.add_argument('--remat', type=bool, default=False, help='Selective rematerialization of layers in the backward (large N)')
    parser.add_argument('--pallas-edge-mlp', type=bool, default=False, help='Fused Pallas edge-MLP kernel (f32/silu)')
    parser.add_argument('--tabulated-edge-mlp', type=int, default=0, help='Chebyshev terms for spectrally tabulated edge filters; 0 = exact MLP (T=128 ~ 2e-6 force dev)')
    parser.add_argument('--pallas-embedding', type=bool, default=False, help='Fused radial-embedding kernel (wins at >10k atoms)')
    parser.add_argument('--neighbor-strategy', type=str, default='brute', choices=['brute', 'cell'])
    parser.add_argument('--cells-per-dim', type=lambda x: list(yaml.safe_load(x)), default=None, help='Static cell grid for neighbor-strategy=cell under jit')
    parser.add_argument('--cell-capacity', type=int, default=64)
    # other args
    parser.add_argument('--derivative', default=False, type=bool)
    parser.add_argument('--cutoff-lower', type=float, default=0.0)
    parser.add_argument('--cutoff-upper', type=float, default=5.0)
    parser.add_argument('--atom-filter', type=int, default=-1)
    parser.add_argument('--max-z', type=int, default=100)
    parser.add_argument('--max-num-neighbors', type=int, default=32)
    parser.add_argument('--standardize', type=bool, default=False)
    parser.add_argument('--reduce-op', type=str, default='add', choices=['add', 'mean'])
    parser.add_argument('--wandb-use', default=False, type=bool)
    parser.add_argument('--wandb-name', default='training', type=str)
    parser.add_argument('--wandb-project', default='training_', type=str)
    parser.add_argument('--wandb-resume-from-id', default=None, type=str)
    parser.add_argument('--tensorboard-use', default=False, type=bool)
    # fmt: on
    return parser


def get_args(argv=None):
    import sys

    parser = get_argparse()
    args = parser.parse_args(argv)
    if args.redirect:
        os.makedirs(os.path.abspath(args.log_dir), exist_ok=True)
        sys.stdout = open(os.path.join(args.log_dir, "log"), "w")
        sys.stderr = sys.stdout
    if args.inference_batch_size is None:
        args.inference_batch_size = args.batch_size
    os.makedirs(os.path.abspath(args.log_dir), exist_ok=True)
    save_argparse(args, os.path.join(args.log_dir, "input.yaml"),
                  exclude=["conf"])
    return args
