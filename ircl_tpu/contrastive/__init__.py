"""Contrastive training: NT-Xent/MoCo/Proto losses, functional queue + EMA."""

from ircl_tpu.contrastive.losses import nt_xent_loss, moco_infonce_loss, proto_loss

__all__ = ["nt_xent_loss", "moco_infonce_loss", "proto_loss"]
