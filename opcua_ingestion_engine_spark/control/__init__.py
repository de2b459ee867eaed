from .rest import ConnectionConfigStore, ControlPlaneServer

__all__ = ["ConnectionConfigStore", "ControlPlaneServer"]
