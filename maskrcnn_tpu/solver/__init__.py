from .build import make_optimizer, warmup_multistep_schedule

__all__ = ["make_optimizer", "warmup_multistep_schedule"]
