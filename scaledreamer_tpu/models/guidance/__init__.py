from . import asd, dummy, mvdream_asd, schedule, sd_asd  # noqa: F401
