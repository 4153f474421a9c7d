"""Train CLI (reference train.py contract: ``-c <config-name|json> [-r resume] [-w weights]``)."""

import argparse
import json

import orienmask_tpu.config as config_module
from orienmask_tpu.trainer import build_trainer

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Train Model")
    parser.add_argument("-c", "--config", default=None, type=str,
                        help="config name or json file path (default: None)")
    parser.add_argument("-r", "--resume", default=None, type=str,
                        help="checkpoint to resume training (default: None)")
    parser.add_argument("-w", "--weights", default=None, type=str,
                        help="weights to start training (default: None)")
    parser.add_argument("--coordinator", default=None, type=str,
                        help="multi-host coordinator address (host:port)")
    parser.add_argument("--num-processes", default=None, type=int)
    parser.add_argument("--process-id", default=None, type=int)
    args = parser.parse_args()

    # Persistent compile cache: repeat runs (resume, re-launch after a
    # failure, CI rehearsals) skip the multi-minute XLA compile.
    import os

    from orienmask_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(os.path.dirname(os.path.abspath(__file__)))

    # Distributed init FIRST: jax.distributed.initialize must run before
    # anything touches the backend (the resume path below deserializes a
    # checkpoint, which can).
    if args.num_processes and args.num_processes > 1:
        from orienmask_tpu.parallel import init_distributed

        init_distributed(args.coordinator, args.num_processes, args.process_id)

    if args.config is not None:
        if args.config.endswith(".json"):
            with open(args.config) as fh:
                train_config = json.load(fh)
        else:
            train_config = getattr(config_module, args.config)
    elif args.resume is not None:
        from orienmask_tpu.trainer import load_checkpoint

        train_config = load_checkpoint(args.resume)["config"]
    else:
        raise AssertionError("Configuration file need to be specified.")

    trainer = build_trainer(train_config, resume=args.resume, weights=args.weights)
    trainer.train()
