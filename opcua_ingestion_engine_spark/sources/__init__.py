from .config import (  # noqa: F401
    load_connection_config,
    load_devices_json,
    load_templates_json,
)
