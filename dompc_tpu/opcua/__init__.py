"""OPC UA real-time interface (reference: do_mpc/opcua/).

The network stack stays host-side Python exactly as in the reference (this
is wall-clock plumbing, not TPU compute — SURVEY.md §5).  Requires the
optional ``asyncua`` package; import is gated in ``dompc_tpu.__init__``.
"""
from ._helper import ServerOpts, ClientOpts, NamespaceEntry, Namespace
from ._base import RTBase
from ._client import RTClient
from ._server import RTServer

__all__ = ["RTServer", "RTClient", "RTBase", "Namespace", "NamespaceEntry",
           "ServerOpts", "ClientOpts"]
