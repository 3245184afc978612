from .labels import encode_activity, encode_event_type

__all__ = ["encode_activity", "encode_event_type"]
