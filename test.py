"""COCO-eval CLI (reference test.py contract: ``-c <config> -w <checkpoint>``)."""

import argparse
import json

import orienmask_tpu.config as config_module
from orienmask_tpu.trainer import build_tester

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Test Model")
    parser.add_argument("-c", "--config", required=True, type=str,
                        help="config name or json file path")
    parser.add_argument("-w", "--checkpoint", required=True, type=str,
                        help="model checkpoint to test")
    args = parser.parse_args()

    if args.config.endswith(".json"):
        with open(args.config) as fh:
            test_config = json.load(fh)
    else:
        test_config = getattr(config_module, args.config)

    tester = build_tester(test_config, args.checkpoint)
    tester.test()
