"""Console entry point (``nafp-tpu ...``): re-exports the repo-root CLI.

Kept separate from run.py so the installed package works without the repo
checkout while ``python run.py ...`` keeps reference-CLI parity.
"""
from __future__ import annotations

import click

from nafp_tpu.configuration import load_config, print_config, update_config


@click.group()
def main():
    """nafp_tpu: train -> generate -> evaluate."""


@main.command()
@click.argument("checkpoint_name", required=True)
@click.option("--config", "-c", default="default")
@click.option("--max_epoch", default=None, type=click.INT)
def train(checkpoint_name, config, max_epoch):
    """Train a neural audio fingerprinter."""
    from nafp_tpu.train.trainer import trainer
    cfg = load_config(config)
    if max_epoch:
        update_config(cfg, "TRAIN", "MAX_EPOCH", max_epoch)
    print_config(cfg)
    trainer(cfg, checkpoint_name)


@main.command()
@click.argument("checkpoint_name", required=True)
@click.argument("checkpoint_index", required=False, type=click.INT)
@click.option("--config", "-c", default="default")
@click.option("--source", "-s", default=None)
@click.option("--output", "-o", default=None)
@click.option("--skip_dummy", default=False, is_flag=True)
@click.option("--yes", "-y", default=False, is_flag=True)
def generate(checkpoint_name, checkpoint_index, config, source, output,
             skip_dummy, yes):
    """Generate fingerprints from a saved checkpoint."""
    from nafp_tpu.generate import generate_fingerprint
    cfg = load_config(config)
    generate_fingerprint(cfg, checkpoint_name, checkpoint_index, source,
                         output, skip_dummy, assume_yes=yes)


@main.command()
@click.argument("checkpoint_name", required=True)
@click.argument("checkpoint_index", required=True)
@click.option("--config", "-c", default="default")
@click.option("--index_type", "-i", default="ivfpq")
@click.option("--test_seq_len", default="1 3 5 9 11 19")
@click.option("--test_ids", "-t", default="icassp")
@click.option("--emb_dummy_dir", default=None)
@click.option("--nogpu", default=False, is_flag=True)
def evaluate(checkpoint_name, checkpoint_index, config, index_type,
             test_seq_len, test_ids, emb_dummy_dir, nogpu):
    """Search and evaluation (ICASSP protocol)."""
    if nogpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from nafp_tpu.search.evaluate import eval_fingerprints
    cfg = load_config(config)
    emb_dir = (cfg["DIR"]["OUTPUT_ROOT_DIR"].rstrip("/") + "/" +
               checkpoint_name + "/" + str(checkpoint_index) + "/")
    eval_fingerprints(emb_dir, emb_dummy_dir=emb_dummy_dir,
                      index_type=index_type, test_ids=test_ids,
                      test_seq_len=test_seq_len)


if __name__ == "__main__":
    main()
