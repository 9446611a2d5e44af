"""OPC UA real-time interface (reference: do_mpc/opcua/).

The network stack stays host-side Python exactly as in the reference (this
is wall-clock plumbing, not TPU compute — SURVEY.md §5).  The namespace /
tag plumbing (Namespace, NamespaceEntry, RTBase) imports without the
optional ``asyncua`` package; the network client/server (RTClient,
RTServer) require it and are None when it is absent.
"""
from ._helper import ServerOpts, ClientOpts, NamespaceEntry, Namespace
from ._base import RTBase

try:
    from ._client import RTClient
    from ._server import RTServer
except ImportError:          # asyncua not installed
    RTClient = None
    RTServer = None

__all__ = ["RTServer", "RTClient", "RTBase", "Namespace", "NamespaceEntry",
           "ServerOpts", "ClientOpts"]
