"""Utilities: meters, visualization, config."""

from fal_net_tpu.utils.meters import AverageMeter, MultiAverageMeter

__all__ = ["AverageMeter", "MultiAverageMeter"]
