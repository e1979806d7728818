from nafp_tpu.losses.ntxent import ntxent_loss
from nafp_tpu.losses.triplet import online_triplet_loss

__all__ = ["ntxent_loss", "online_triplet_loss"]
