"""OPC UA namespace / tag plumbing, unit-tested WITHOUT asyncua
(the network stack is optional; reference behavior at
do_mpc/opcua/_base.py:92-257, _helper.py:26-117).  A dict-backed fake
client stands in for the OPC UA server."""
import time

import numpy as np

import dompc_tpu as dm
from dompc_tpu.opcua import (ClientOpts, Namespace, NamespaceEntry, RTBase)
import systems


class FakeClient:
    """Dict-backed stand-in for RTClient (no network)."""

    store = {}

    def __init__(self, opts, namespace):
        self.opts = opts
        self.namespace_list = [namespace]
        self.connected = False

    def connect(self):
        self.connected = True

    def disconnect(self):
        self.connected = False

    def writeData(self, tag, value):
        FakeClient.store[tag] = value

    def readData(self, tag):
        return FakeClient.store[tag]


def _client_opts():
    return ClientOpts("test_client", "localhost", 4840, timeunit=1.0)


def test_namespace_entry_node_id():
    e = NamespaceEntry("Simulator", "x[0]")
    assert e.get_node_id(7) == "ns=7;s=Simulator[x[0]]"


def test_namespace_indexing():
    ns = Namespace("plant", [NamespaceEntry("Sim", "x[0]"),
                             NamespaceEntry("Sim", "x[1]"),
                             NamespaceEntry("Sim", "u[0]")])
    ns.namespace_index = 2
    assert ns.has_entry(NamespaceEntry("Sim", "x[0]"))
    assert not ns.has_entry(NamespaceEntry("Sim", "q[0]"))
    assert ns["x[1]"] == ["ns=2;s=Sim[x[1]]"]
    ns.add_entries([NamespaceEntry("Sim", "q[0]")])
    assert ns.has_entry(NamespaceEntry("Sim", "q[0]"))


def test_namespace_from_model():
    model = systems.oscillating_masses_model()
    sim = dm.Simulator(model)
    sim.set_param(t_step=0.5)
    sim.setup()
    rt = RTBase(sim, _client_opts(), client_factory=FakeClient)
    names = [e.variable for e in rt.def_namespace.entry_list]
    # 4 states, 1 input, 4 measurements (default y = x) at least
    assert "x[0]" in names and "x[3]" in names and "u[0]" in names
    assert rt.def_namespace.namespace_name == "Simulator"
    assert rt.cycle_time == 0.5


def test_rtbase_make_step_roundtrip():
    """Distributed loop step: the simulator node reads u from the fake
    server, steps the plant, writes y back (reference _base.py:175-183)."""
    model = systems.oscillating_masses_model()
    sim = dm.Simulator(model)
    sim.set_param(t_step=0.5)
    sim.setup()
    x0 = np.array([0.2, -0.1, 0.3, 0.0])
    sim.x0 = x0

    rt = RTBase(sim, _client_opts(), client_factory=FakeClient)
    rt.connect()
    assert rt.client.connected
    rt.set_read_tags(["ns=1;s=MPC[u[0]]"])
    rt.set_write_tags([f"ns=1;s=Simulator[y[{i}]]" for i in range(4)])

    FakeClient.store["ns=1;s=MPC[u[0]]"] = 0.25
    rt.make_step()
    y = np.array([FakeClient.store[f"ns=1;s=Simulator[y[{i}]]"]
                  for i in range(4)])
    # must equal a direct simulator step with the same input
    sim2 = dm.Simulator(model)
    sim2.set_param(t_step=0.5)
    sim2.setup()
    sim2.x0 = x0
    y_ref = sim2.make_step(np.array([[0.25]])).reshape(-1)
    np.testing.assert_allclose(y, y_ref, atol=1e-12)
    rt.disconnect()


def test_rtbase_write_size_mismatch():
    model = systems.oscillating_masses_model()
    sim = dm.Simulator(model)
    sim.set_param(t_step=0.5)
    sim.setup()
    rt = RTBase(sim, _client_opts(), client_factory=FakeClient)
    rt.set_write_tags(["a", "b"])
    try:
        rt.write_to_tags(np.zeros(3))
        raise AssertionError("expected RuntimeError")
    except RuntimeError:
        pass


def test_rtbase_async_loop():
    """Threaded periodic execution (reference async_step_start,
    _base.py:230-248): runs at the cycle time until stopped."""
    model = systems.oscillating_masses_model()
    sim = dm.Simulator(model)
    sim.set_param(t_step=0.02)
    sim.setup()
    sim.x0 = np.zeros(4)
    rt = RTBase(sim, _client_opts(), client_factory=FakeClient)
    rt.set_read_tags(["ns=1;s=MPC[u[0]]"])
    rt.set_write_tags([f"ns=1;s=Simulator[y[{i}]]" for i in range(4)])
    FakeClient.store["ns=1;s=MPC[u[0]]"] = 0.0
    rt.async_step_start()
    # poll instead of a fixed sleep: under load (parallel test workers)
    # the first cycle carries a jit compile and a 0.15 s window flakes
    deadline = time.time() + 10.0
    while sim.data._y.shape[0] < 2 and time.time() < deadline:
        time.sleep(0.02)
    rt.async_step_stop()
    rt.new_thread.join(timeout=2.0)
    assert sim.data._y.shape[0] >= 2   # several cycles ran


# ---------------------------------------------------------------------------
# Live loopback over a real OPC UA server (reference examples run exactly
# this loop; do_mpc/opcua/_server.py:82-109).  Requires asyncua, which is
# optional — the test skips cleanly where the network stack is absent.
# ---------------------------------------------------------------------------
import pytest

try:
    import asyncua  # noqa: F401
    _HAS_ASYNCUA = True
except ImportError:
    _HAS_ASYNCUA = False


@pytest.mark.slow
@pytest.mark.skipif(not _HAS_ASYNCUA, reason="asyncua not installed")
def test_live_loopback_mpc_simulator():
    """RTServer on localhost + two RTBase clients (MPC and plant
    simulator) round-tripping 3 cycles over opc.tcp; the distributed
    trajectory must match the direct in-process loop."""
    from dompc_tpu.opcua import RTServer, ServerOpts

    def build_pair():
        model = systems.oscillating_masses_model()
        mpc = systems.oscillating_masses_mpc(model)
        sim = dm.Simulator(model)
        sim.set_param(t_step=0.5)
        sim.setup()
        return model, mpc, sim

    x0 = np.array([2.0, 1.0, 0.0, 0.0])

    # direct loop (truth)
    _, mpc_d, sim_d = build_pair()
    mpc_d.x0 = x0
    sim_d.x0 = x0
    mpc_d.set_initial_guess()
    xk = x0
    for _ in range(3):
        u = mpc_d.make_step(xk)
        xk = sim_d.make_step(u).reshape(-1)

    # distributed loop over a real local server
    port = 46295
    _, mpc_n, sim_n = build_pair()
    mpc_n.x0 = x0
    sim_n.x0 = x0
    mpc_n.set_initial_guess()
    server = RTServer(ServerOpts("srv", "localhost", port))
    rt_mpc = RTBase(mpc_n, ClientOpts("mpc", "localhost", port))
    rt_sim = RTBase(sim_n, ClientOpts("sim", "localhost", port))
    server.namespace_from_client(rt_mpc)
    server.namespace_from_client(rt_sim)
    server.start()
    try:
        rt_mpc.connect()
        rt_sim.connect()
        ns_mpc = rt_mpc.client.namespace_list[0]
        ns_sim = rt_sim.client.namespace_list[0]
        x_tags = sum((ns_sim[f"y[{i}]"] for i in range(4)), [])
        u_tags = ns_mpc["u[0]"]
        rt_mpc.set_read_tags(x_tags)
        rt_mpc.set_write_tags(u_tags)
        rt_sim.set_read_tags(u_tags)
        rt_sim.set_write_tags(x_tags)
        # seed the plant state tags with x0
        rt_sim.write_to_tags(x0)
        for _ in range(3):
            rt_mpc.make_step()
            rt_sim.make_step()
    finally:
        try:
            rt_mpc.disconnect()
            rt_sim.disconnect()
        finally:
            server.stop()

    np.testing.assert_allclose(mpc_n.data._u, mpc_d.data._u,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(sim_n.data._x, sim_d.data._x,
                               rtol=1e-8, atol=1e-10)
