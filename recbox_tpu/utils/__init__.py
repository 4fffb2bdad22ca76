from recbox_tpu.utils.logging import MetricsWriter, profile_step, set_logger
from recbox_tpu.utils.seeding import seed_everything

__all__ = ["MetricsWriter", "profile_step", "set_logger", "seed_everything"]
