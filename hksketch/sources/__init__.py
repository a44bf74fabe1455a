from .flows import format_flow_keys, read_flow_records

__all__ = ["read_flow_records", "format_flow_keys"]
