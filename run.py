#!/usr/bin/env python
"""nafp_tpu CLI: train -> generate -> evaluate.

Same command surface as the reference ``run.py:37-166``:

    python run.py train CHECKPOINT_NAME [--max_epoch N] [-c CONFIG]
    python run.py generate CHECKPOINT_NAME [CHECKPOINT_INDEX] [-c CONFIG]
                   [--source DIR] [--output DIR] [--skip_dummy]
    python run.py evaluate CHECKPOINT_NAME CHECKPOINT_INDEX [-c CONFIG]
                   [--index_type ivfpq] [--test_seq_len '1 3 5 9 11 19']
                   [--test_ids icassp] [--nogpu]
"""
import click

from nafp_tpu.configuration import load_config, print_config, update_config


@click.group()
def cli():
    """train -> generate -> evaluate.

    How to use each command: python run.py COMMAND --help
    """


@cli.command()
@click.argument("checkpoint_name", required=True)
@click.option("--config", "-c", default="default", type=click.STRING,
              help="Name of model configuration located in './config/.'")
@click.option("--max_epoch", default=None, type=click.INT, help="Max epoch.")
def train(checkpoint_name, config, max_epoch):
    """Train a neural audio fingerprinter.

    ex) python run.py train CHECKPOINT_NAME --max_epoch=100

    If the checkpoint directory already exists, training resumes from the
    latest checkpoint.
    """
    from nafp_tpu.train.trainer import trainer

    cfg = load_config(config)
    if max_epoch:
        update_config(cfg, "TRAIN", "MAX_EPOCH", max_epoch)
    print_config(cfg)
    trainer(cfg, checkpoint_name)


@cli.command()
@click.argument("checkpoint_name", required=True)
@click.argument("checkpoint_index", required=False, type=click.INT)
@click.option("--config", "-c", default="default", type=click.STRING,
              help="Name of the model configuration file in 'config/'.")
@click.option("--source", "-s", default=None, type=click.STRING,
              help="Custom source root directory (16-bit 8 kHz mono WAV); "
                   "builds a database without synthesizing queries.")
@click.option("--output", "-o", default=None, type=click.STRING,
              help="Root directory for generated embeddings. Default is "
                   "OUTPUT_ROOT_DIR/CHECKPOINT_NAME from config.")
@click.option("--skip_dummy", default=False, is_flag=True,
              help="Exclude dummy-DB from the default source.")
@click.option("--yes", "-y", default=False, is_flag=True,
              help="Skip the dummy_db overwrite confirmation prompt.")
def generate(checkpoint_name, checkpoint_index, config, source, output,
             skip_dummy, yes):
    """Generate fingerprints from a saved checkpoint.

    If CHECKPOINT_INDEX is not given, the latest checkpoint is used.
    """
    from nafp_tpu.generate import generate_fingerprint

    cfg = load_config(config)
    generate_fingerprint(cfg, checkpoint_name, checkpoint_index, source,
                         output, skip_dummy, assume_yes=yes)


@cli.command()
@click.argument("checkpoint_name", required=True)
@click.argument("checkpoint_index", required=True)
@click.option("--config", "-c", default="default", type=click.STRING,
              help="Name of the model configuration file in 'config/'.")
@click.option("--index_type", "-i", default="ivfpq", type=click.STRING,
              help="One of {'l2','ip','ivf','ivfpq','ivfpq-rr','ivf-sq8','l2-sharded','hnsw'}.")
@click.option("--test_seq_len", default="1 3 5 9 11 19", type=click.STRING,
              help="Space-separated segment counts to test "
                   "(default '1 3 5 9 11 19' = 1s..10s).")
@click.option("--test_ids", "-t", default="icassp", type=click.STRING,
              help="One of {'all', 'icassp', 'path/file.npy', (int)}.")
@click.option("--emb_dummy_dir", default=None, type=click.STRING,
              help="Directory containing dummy_db.mm/_shape.npy to use "
                   "instead of EMB_DIR (parity with eval_faiss.py).")
@click.option("--nogpu", default=False, is_flag=True,
              help="Run the search on CPU devices (parity flag).")
def evaluate(checkpoint_name, checkpoint_index, config, index_type,
             test_seq_len, test_ids, emb_dummy_dir, nogpu):
    """Search and evaluation.

    ex) python run.py evaluate CHECKPOINT_NAME CHECKPOINT_INDEX -i ivfpq
    """
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
    cli()
