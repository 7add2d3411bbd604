from .events import hourly_event_counts, read_events_stream, run_available_now

__all__ = ["hourly_event_counts", "read_events_stream", "run_available_now"]
