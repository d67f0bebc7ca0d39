from . import asd, dummy, schedule, sd_asd  # noqa: F401
