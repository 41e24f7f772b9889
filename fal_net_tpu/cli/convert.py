"""Convert a reference PyTorch checkpoint to the native format.

    python -m fal_net_tpu.cli.convert --input model_best.pth.tar --output ckpt_dir/

The reference publishes pretrained ``.pth.tar`` weights (README.md:5-11);
this converts them once so later loads need no torch.  The reverse
direction isn't provided: native checkpoints carry optimizer state the
reference's format cannot represent.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="reference checkpoint -> native")
    p.add_argument("--input", required=True, help="reference .pth/.pth.tar file")
    p.add_argument("--output", required=True, help="output directory")
    args = p.parse_args(argv)

    from flax import serialization

    from fal_net_tpu.models.torch_import import load_torch_checkpoint

    params, name, num_levels = load_torch_checkpoint(args.input)
    os.makedirs(args.output, exist_ok=True)
    path = os.path.join(args.output, "checkpoint.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    with open(os.path.join(args.output, "checkpoint.json"), "w") as f:
        json.dump({"model_name": name, "num_levels": num_levels}, f, indent=2)
    print(f"=> {name} (N={num_levels}) -> {path}")


if __name__ == "__main__":
    main()
