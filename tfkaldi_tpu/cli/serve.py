"""Decode-service driver: load the trained net once, then serve.

Spool mode (default) — watch a directory for featdir jobs::

    python -m tfkaldi_tpu.cli.serve --config config.cfg \
        --watch /spool/in --out /spool/out [--once] [--poll 1.0]

Jobs are featdir directories dropped under --watch (see
tfkaldi_tpu/serve.py for the contract). ``--once`` processes the current
spool and exits (cron-style); default runs forever.

Streaming mode (``--stream``) — low-latency socket serving for CTC and
RNN-T configs: float32 PCM chunks in, partial transcripts per chunk, a
final on finish (wire protocol in tfkaldi_tpu/serve.py). All concurrent
connections share ONE batched device program (``MultiStreamServer``;
``--slots`` bounds concurrency)::

    python -m tfkaldi_tpu.cli.serve --config config.cfg --stream \
        [--host 127.0.0.1] [--port 0] [--slots 8] [--chunk-size 1600] \
        [--rate 16000] [--endpoint]

CMVN uses the training corpus' pooled stats (live streams have no
speaker statistics); disable with ``apply_cmvn = False`` in
``[dnn-features]`` like the offline pipeline.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from configparser import ConfigParser

log = logging.getLogger("tfkaldi_tpu.serve")


def main(argv=None, stop=None) -> int:
    """``stop`` (optional ``() -> bool``): polled by the streaming accept
    loop so embedders/tests can shut the server down; the CLI itself runs
    until killed."""
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--watch", help="spool input dir (spool mode)")
    parser.add_argument("--out", help="spool output dir (spool mode)")
    parser.add_argument("--once", action="store_true")
    parser.add_argument("--poll", type=float, default=1.0)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument(
        "--stream", action="store_true",
        help="serve a low-latency streaming socket instead of the spool",
    )
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=0)
    parser.add_argument(
        "--slots", type=int, default=None,
        help="concurrent streams sharing the batched device program "
             "(default: MultiStreamServer.DEFAULT_SLOTS = the measured "
             "real-time occupancy ceiling, docs/PERF_STREAMING.md; raise "
             "toward 64+ for batch-oriented transcription pools)",
    )
    parser.add_argument(
        "--chunk-size", type=int, default=1600,
        help="max audio samples per client chunk (one compiled shape)",
    )
    parser.add_argument(
        "--rate", type=int, default=16000,
        help="PCM sample rate the clients stream at",
    )
    parser.add_argument(
        "--beam-width", type=int, default=None,
        help="override the config's beam width (CTC streaming only)",
    )
    parser.add_argument(
        "--endpoint", action="store_true",
        help="finish utterances server-side on the default endpoint rules",
    )
    parser.add_argument(
        "--port-file",
        help="write 'host port' here once bound (readiness signal; "
        "useful with --port 0)",
    )
    args = parser.parse_args(argv)

    config = ConfigParser()
    if not config.read(args.config):
        log.error("cannot read config %s", args.config)
        return 1

    from tfkaldi_tpu.cli.main import _cmvn_path, resolve_labels
    from tfkaldi_tpu.io import ArkReader
    from tfkaldi_tpu.nnet import Nnet

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

    if args.stream:
        from tfkaldi_tpu.serve import (
            MultiStreamServer,
            build_streaming_transcriber,
            global_cmvn,
        )

        endpoint_config = None
        if args.endpoint:
            from tfkaldi_tpu.decode.endpoint import EndpointConfig

            endpoint_config = EndpointConfig()
        cmvn = (
            global_cmvn(featdir) if _cmvn_path(config, featdir) else None
        )
        transcriber = build_streaming_transcriber(
            nnet, coder, args.rate, dict(config["dnn-features"]),
            cmvn=cmvn, beam_width=args.beam_width,
            endpoint_config=endpoint_config,
        )
        if args.slots is None:
            args.slots = MultiStreamServer.DEFAULT_SLOTS
        server = MultiStreamServer(
            transcriber,
            num_slots=args.slots,
            chunk_size=args.chunk_size,
            host=args.host,
            port=args.port,
        )
        # port 0 binds an ephemeral port — print the resolved address so
        # clients (and tests) can find it
        print(f"streaming on {server.host}:{server.port}", flush=True)
        if args.port_file:
            with open(args.port_file, "w") as f:
                f.write(f"{server.host} {server.port}\n")
        log.info(
            "streaming server: %s:%d, %d slots, chunk %d samples @ %d Hz",
            server.host, server.port, args.slots, args.chunk_size, args.rate,
        )
        try:
            server.serve_forever(stop=stop or (lambda: False))
        finally:
            server.close()
        return 0

    if not args.watch or not args.out:
        parser.error("spool mode needs --watch and --out (or pass --stream)")

    from tfkaldi_tpu.serve import DecodeService

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
