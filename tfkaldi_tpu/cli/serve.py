"""Decode-service driver: load the trained net once, watch a spool dir.

    python -m tfkaldi_tpu.cli.serve --config config.cfg \
        --watch /spool/in --out /spool/out [--once] [--poll 1.0]

Jobs are featdir directories dropped under --watch (see
tfkaldi_tpu/serve.py for the contract). ``--once`` processes the current
spool and exits (cron-style); default runs forever.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from configparser import ConfigParser

log = logging.getLogger("tfkaldi_tpu.serve")


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--watch", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--once", action="store_true")
    parser.add_argument("--poll", type=float, default=1.0)
    parser.add_argument("--batch-size", type=int, default=16)
    args = parser.parse_args(argv)

    config = ConfigParser()
    if not config.read(args.config):
        log.error("cannot read config %s", args.config)
        return 1

    from tfkaldi_tpu.cli.main import resolve_labels
    from tfkaldi_tpu.io import ArkReader
    from tfkaldi_tpu.nnet import Nnet
    from tfkaldi_tpu.serve import DecodeService

    # input dim from the trained featdir (same rule as cli.main)
    featdir = os.path.join(
        config.get("directories", "train_features"), config.get("dnn-features", "name")
    )
    reader = ArkReader(os.path.join(featdir, "feats.scp"))
    input_dim = reader.read_utt_data(0).shape[1]
    reader.close()

    # same label/alphabet resolution as the training driver
    _ctc, coder, num_labels, _gmm = resolve_labels(config)

    nnet = Nnet(config, input_dim, num_labels)
    service = DecodeService(
        nnet, args.watch, args.out, coder=coder, batch_size=args.batch_size
    )
    if args.once:
        n = service.process_pending()
        log.info("processed %d job(s)", n)
    else:
        service.run(poll_seconds=args.poll)
    return 0


if __name__ == "__main__":
    sys.exit(main())
