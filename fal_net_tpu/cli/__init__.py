"""Command-line entry points: python -m fal_net_tpu.cli.train / .test"""
