"""On-device compute ops: decode engine, losses, CIDEr-D reward."""
