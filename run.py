#!/usr/bin/env python
"""nafp_tpu CLI shim: train -> generate -> evaluate.

Same command surface as the reference ``run.py:37-166``:

    python run.py train CHECKPOINT_NAME [--max_epoch N] [-c CONFIG]
    python run.py generate CHECKPOINT_NAME [CHECKPOINT_INDEX] [-c CONFIG]
                   [--source DIR] [--output DIR] [--skip_dummy]
    python run.py evaluate CHECKPOINT_NAME CHECKPOINT_INDEX [-c CONFIG]
                   [--index_type ivfpq] [--test_seq_len '1 3 5 9 11 19']
                   [--test_ids icassp] [--nogpu]

The actual command definitions live in ``nafp_tpu.cli`` (one canonical copy,
shared with the installed ``nafp-tpu`` console script).
"""
from nafp_tpu.cli import main as cli

if __name__ == "__main__":
    cli()
