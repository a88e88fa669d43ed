from .event_log import read_event_log, snapshot_as_events  # noqa: F401
