from . import raw, coords, schedules
