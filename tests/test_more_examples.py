"""Remaining reference example regressions: discrete DAE MPC, CSTR LQR
(linearize + discretize + rate penalization), batch-reactor LQR via
dae2ode conversion, industrial polymerization robust MPC."""
import numpy as np
import pytest

import dompc_tpu as dm
from dompc_tpu import sym
from golden import load_golden


def test_oscillating_masses_discrete_dae():
    """Reference: examples/oscillating_masses_discrete_dae (x_next as an
    algebraic variable of a discrete model)."""
    ref = load_golden("results_oscillatingMasses_dae")
    m = dm.model.Model("discrete")
    x = m.set_variable("_x", "x", (4, 1))
    u = m.set_variable("_u", "u", (1, 1))
    m.set_expression("cost", sym.sum1(x**2))
    A = np.array([[0.763, 0.460, 0.115, 0.020],
                  [-0.899, 0.763, 0.420, 0.115],
                  [0.115, 0.020, 0.763, 0.460],
                  [0.420, 0.115, -0.899, 0.763]])
    B = np.array([[0.014], [0.063], [0.221], [0.367]])
    x_next = m.set_variable("_z", "x_next", (4, 1))
    m.set_rhs("x", x_next)
    m.set_alg("x_next", x_next - A @ x - B @ u)
    m.setup()

    mpc = dm.controller.MPC(m)
    mpc.settings.n_robust = 0
    mpc.settings.n_horizon = 7
    mpc.settings.t_step = 0.5
    mpc.set_objective(mterm=m.aux["cost"], lterm=m.aux["cost"])
    mpc.set_rterm(u=1e-4)
    max_x = np.array([[4.0], [10.0], [4.0], [10.0]])
    mpc.bounds["lower", "_x", "x"] = -max_x
    mpc.bounds["upper", "_x", "x"] = max_x
    mpc.bounds["lower", "_u", "u"] = -0.5
    mpc.bounds["upper", "_u", "u"] = 0.5
    mpc.setup()

    sim = dm.Simulator(m)
    sim.set_param(t_step=0.5)
    sim.setup()

    np.random.seed(99)
    x0 = np.random.rand(m.n_x) - 0.5
    mpc.x0 = x0
    sim.x0 = x0
    mpc.set_initial_guess()
    for _ in range(5):
        u0 = mpc.make_step(x0)
        y = sim.make_step(u0)
        x0 = y.reshape(-1)

    for module, mine in (("mpc", mpc.data), ("simulator", sim.data)):
        for attr in ("_x", "_u", "_time"):
            err = np.max(np.abs(getattr(mine, attr)
                                - getattr(ref[module], attr)))
            assert err < 1e-5, f"{module}{attr}: {err:.2e}"


def _cstr_lqr_models():
    """Reference: examples/lqr_examples/CSTR_lqr/template_model.py."""
    m = dm.model.Model("continuous")
    K0_1 = K0_2 = 2.145e10
    E_R_1 = E_R_2 = 9758.3
    delH_R_1, del_H_R_2 = -4200, -11000
    T_in, rho, cp, cp_J = 387.05, 934.2, 3.01, 2
    m_j, kA, C_ain, V = 5, 14.448, 5.1, 0.01
    C_a = m.set_variable("_x", "C_a")
    C_b = m.set_variable("_x", "C_b")
    T_R = m.set_variable("_x", "T_R")
    T_J = m.set_variable("_x", "T_J")
    F = m.set_variable("_u", "F")
    Q_J = m.set_variable("_u", "Q_J")
    r_1 = K0_1 * sym.exp((-E_R_1) / T_R) * C_a
    r_2 = K0_2 * sym.exp((-E_R_2) / T_R) * C_b
    m.set_expression("r", sym.vertcat(r_1, r_2))
    m.set_rhs("C_a", (F / V) * (C_ain - C_a) - r_1)
    m.set_rhs("C_b", -(F / V) * C_b + r_1 - r_2)
    m.set_rhs("T_R", (F / V) * (T_in - T_R)
              - (kA / (rho * cp * V)) * (T_R - T_J)
              + (1 / (rho * cp)) * ((delH_R_1 * (-r_1))
                                    + (del_H_R_2 * (-r_2))))
    m.set_rhs("T_J", (1 / (m_j * cp_J)) * (-Q_J + kA * (T_R - T_J)))
    m.setup()
    uss = np.array([[0.002365], [18.5583]])
    xss = np.array([[1.6329], [1.1101], [398.6581], [397.3736]])
    lin = dm.model.linearize(m, xss, uss)
    return m, lin, xss, uss


def test_cstr_lqr_closed_loop():
    """Reference test: testing/test_CSTR_lqr.py (200 steps)."""
    ref = load_golden("results_CSTR_LQR")
    model, linearmodel, xss, uss = _cstr_lqr_models()
    model_dc = linearmodel.discretize(0.5)
    lqr = dm.controller.LQR(model_dc)
    lqr.set_param(n_horizon=10, t_step=0.5)
    Q = 10 * np.diag([1, 1, 0.01, 0.01])
    R = np.diag([1e-1, 1e-5])
    lqr.set_objective(Q=Q, R=R)
    lqr.set_rterm(delR=np.diag([1e8, 1.0]))
    lqr.setup()

    sim = dm.Simulator(model)
    sim.set_param(integration_tool="cvodes", abstol=1e-10, reltol=1e-10,
                  t_step=0.5, substeps=8)
    sim.setup()

    x0 = np.array([0, 0, 387.05, 387.05]).reshape(-1, 1)
    sim.x0 = x0
    lqr.set_setpoint(xss=xss, uss=uss)
    for _ in range(200):
        u0 = lqr.make_step(x0)
        y_next = sim.make_step(u0)
        x0 = y_next
    err = np.max(np.abs(sim.data._x - ref["simulator"]._x))
    assert err < 1e-4, f"sim x err {err:.2e}"


def test_batch_reactor_lqr_dae():
    """Reference test: testing/test_batch_reactor_lqr_dae.py —
    dae2odeconversion -> linearize -> discretize -> LQR."""
    ref = load_golden("results_batch_reactor_LQR_DAE")
    m = dm.model.Model("continuous")
    k1, k2, k3 = 25, 1, 1
    Ca = m.set_variable("_x", "Ca")
    Cb = m.set_variable("_x", "Cb")
    Ad = m.set_variable("_x", "Ad")
    Cain = m.set_variable("_u", "Cain")
    Cc = m.set_variable("_z", "Cc")
    m.set_rhs("Ca", -k1 * Ca + Cain)
    m.set_rhs("Cb", k1 * Ca - k2 * Cb + k3 * Cc)
    m.set_rhs("Ad", Cain)
    m.set_alg("exp", 1 + Ad - Ca - Cb - Cc)
    m.setup()
    daemodel = dm.model.dae2odeconversion(m)
    linearmodel = dm.model.linearize(daemodel)
    model_dc = linearmodel.discretize(0.5)

    lqr = dm.controller.LQR(model_dc)
    lqr.set_param(n_horizon=10, t_step=0.5)
    lqr.set_objective(Q=10 * np.identity(5), R=5 * np.identity(1))
    lqr.setup()

    sim = dm.Simulator(linearmodel)
    sim.set_param(integration_tool="cvodes", t_step=0.5, substeps=8)
    sim.setup()

    x0 = np.array([[1.0], [0.0], [0.0], [0.0], [0.0]])
    sim.x0 = x0
    xss = np.array([[0.0], [2.0], [3.0], [0.0], [2.0]])
    uss = model_dc.get_steady_state(xss=xss)
    lqr.set_setpoint(xss=xss, uss=uss)
    for _ in range(50):
        u0 = lqr.make_step(x0)
        y_next = sim.make_step(u0)
        x0 = y_next
    err = np.max(np.abs(sim.data._x - ref["simulator"]._x))
    assert err < 1e-5, f"sim x err {err:.2e}"


@pytest.mark.slow
def test_industrial_poly():
    """Reference test: testing/test_industrial_poly.py (robust multi-stage,
    nx=10); trimmed to 2 closed-loop steps for CI wall-time."""
    ref = load_golden("results_industrial_poly")
    m = dm.model.Model("continuous")
    R_, T_F, E_a = 8.314, 25 + 273.15, 8500.0
    A_tank = 65.0
    k_U2, k_U1 = 32.0, 4.0
    w_WF, w_AF = 0.333, 0.667
    m_M_KW, fm_M_KW = 5000.0, 300000.0
    m_AWT_KW, fm_AWT_KW = 1000.0, 100000.0
    m_AWT, fm_AWT = 200.0, 20000.0
    m_S = 39000.0
    c_pW, c_pS, c_pF, c_pR = 4.2, 0.47, 3.0, 5.0
    k_WS, k_AS, k_PS = 17280.0, 3600.0, 360.0
    alfa, p_1 = 5 * 20e4 * 3.6, 1.0

    m_W = m.set_variable("_x", "m_W")
    m_A = m.set_variable("_x", "m_A")
    m_P = m.set_variable("_x", "m_P")
    T_R = m.set_variable("_x", "T_R")
    T_S = m.set_variable("_x", "T_S")
    Tout_M = m.set_variable("_x", "Tout_M")
    T_EK = m.set_variable("_x", "T_EK")
    Tout_AWT = m.set_variable("_x", "Tout_AWT")
    accum_monom = m.set_variable("_x", "accum_monom")
    T_adiab = m.set_variable("_x", "T_adiab")
    m_dot_f = m.set_variable("_u", "m_dot_f")
    T_in_M = m.set_variable("_u", "T_in_M")
    T_in_EK = m.set_variable("_u", "T_in_EK")
    delH_R = m.set_variable("_p", "delH_R")
    k_0 = m.set_variable("_p", "k_0")

    U_m = m_P / (m_A + m_P)
    m_ges = m_W + m_A + m_P
    k_R1 = k_0 * sym.exp(-E_a / (R_ * T_R)) * ((k_U1 * (1 - U_m))
                                               + (k_U2 * U_m))
    k_R2 = k_0 * sym.exp(-E_a / (R_ * T_EK)) * ((k_U1 * (1 - U_m))
                                                + (k_U2 * U_m))
    k_K = ((m_W / m_ges) * k_WS) + ((m_A / m_ges) * k_AS) \
        + ((m_P / m_ges) * k_PS)
    dot_m_W = m_dot_f * w_WF
    m.set_rhs("m_W", dot_m_W)
    dot_m_A = (m_dot_f * w_AF) \
        - (k_R1 * (m_A - ((m_A * m_AWT) / (m_W + m_A + m_P)))) \
        - (p_1 * k_R2 * (m_A / m_ges) * m_AWT)
    m.set_rhs("m_A", dot_m_A)
    dot_m_P = (k_R1 * (m_A - ((m_A * m_AWT) / (m_W + m_A + m_P)))) \
        + (p_1 * k_R2 * (m_A / m_ges) * m_AWT)
    m.set_rhs("m_P", dot_m_P)
    dot_T_R = 1.0 / (c_pR * m_ges) * (
        (m_dot_f * c_pF * (T_F - T_R)) - (k_K * A_tank * (T_R - T_S))
        - (fm_AWT * c_pR * (T_R - T_EK))
        + (delH_R * k_R1 * (m_A - ((m_A * m_AWT) / (m_W + m_A + m_P)))))
    m.set_rhs("T_R", dot_T_R)
    m.set_rhs("T_S", 1.0 / (c_pS * m_S) * (
        (k_K * A_tank * (T_R - T_S)) - (k_K * A_tank * (T_S - Tout_M))))
    m.set_rhs("Tout_M", 1.0 / (c_pW * m_M_KW) * (
        (fm_M_KW * c_pW * (T_in_M - Tout_M))
        + (k_K * A_tank * (T_S - Tout_M))))
    m.set_rhs("T_EK", 1.0 / (c_pR * m_AWT) * (
        (fm_AWT * c_pR * (T_R - T_EK)) - (alfa * (T_EK - Tout_AWT))
        + (p_1 * k_R2 * (m_A / m_ges) * m_AWT * delH_R)))
    m.set_rhs("Tout_AWT", 1.0 / (c_pW * m_AWT_KW) * (
        (fm_AWT_KW * c_pW * (T_in_EK - Tout_AWT))
        - (alfa * (Tout_AWT - T_EK))))
    m.set_rhs("accum_monom", m_dot_f)
    m.set_rhs("T_adiab", delH_R / (m_ges * c_pR) * dot_m_A
              - (dot_m_A + dot_m_W + dot_m_P)
              * (m_A * delH_R / (m_ges * m_ges * c_pR)) + dot_T_R)
    m.setup()

    mpc = dm.controller.MPC(m)
    s = mpc.settings
    s.n_horizon = 20
    s.n_robust = 1
    s.t_step = 50.0 / 3600.0
    temp_range = 2.0
    mpc.set_objective(mterm=-m.x["m_P"], lterm=-m.x["m_P"])
    mpc.set_rterm(m_dot_f=0.002, T_in_M=0.004, T_in_EK=0.002)
    for nm, lo in (("m_W", 0.0), ("m_A", 0.0), ("m_P", 26.0),
                   ("T_R", 363.15 - temp_range), ("T_S", 298.0),
                   ("Tout_M", 298.0), ("T_EK", 288.0),
                   ("Tout_AWT", 288.0), ("accum_monom", 0.0)):
        mpc.bounds["lower", "_x", nm] = lo
    for nm, hi in (("T_R", 363.15 + temp_range), ("T_S", 400.0),
                   ("Tout_M", 400.0), ("T_EK", 400.0),
                   ("Tout_AWT", 400.0), ("accum_monom", 30000.0),
                   ("T_adiab", 382.15)):
        mpc.bounds["upper", "_x", nm] = hi
    mpc.bounds["lower", "_u", "m_dot_f"] = 0.0
    mpc.bounds["lower", "_u", "T_in_M"] = 333.15
    mpc.bounds["lower", "_u", "T_in_EK"] = 333.15
    mpc.bounds["upper", "_u", "m_dot_f"] = 3.0e4
    mpc.bounds["upper", "_u", "T_in_M"] = 373.15
    mpc.bounds["upper", "_u", "T_in_EK"] = 373.15
    mpc.scaling["_x", "m_W"] = 10
    mpc.scaling["_x", "m_A"] = 10
    mpc.scaling["_x", "m_P"] = 10
    mpc.scaling["_x", "accum_monom"] = 10
    mpc.scaling["_u", "m_dot_f"] = 100
    mpc.set_uncertainty_values(
        delH_R=np.array([950.0, 950.0 * 1.30, 950.0 * 0.70]),
        k_0=np.array([7.0, 7.0 * 1.30, 7.0 * 0.70]))
    mpc.setup()

    sim = dm.Simulator(m)
    sim.set_param(integration_tool="cvodes", abstol=1e-10, reltol=1e-10,
                  t_step=50.0 / 3600.0, substeps=6)
    p_num = sim.get_p_template()
    p_num["delH_R"] = 950
    p_num["k_0"] = 7
    sim.set_p_fun(lambda t: p_num)
    sim.setup()

    delH_R_real, c_pR_ = 950.0, 5.0
    x0 = np.array([10000.0, 853.0, 26.5, 363.15, 363.15, 363.15,
                   308.15, 308.15, 300.0, 0.0])
    x0[9] = x0[1] * delH_R_real / ((x0[0] + x0[1] + x0[2]) * c_pR_) + x0[3]
    mpc.x0 = x0
    sim.x0 = x0
    mpc.set_initial_guess()

    n_steps = 2
    for _ in range(n_steps):
        u0 = mpc.make_step(x0)
        y = sim.make_step(u0)
        x0 = y.reshape(-1)

    err_x = np.max(np.abs(mpc.data._x - ref["mpc"]._x[:n_steps])
                   / np.maximum(1.0, np.abs(ref["mpc"]._x[:n_steps])))
    u_scale = np.array([100.0, 1.0, 1.0])
    err_u = np.max(np.abs(mpc.data._u - ref["mpc"]._u[:n_steps]) / u_scale)
    assert err_x < 1e-3, f"x rel err {err_x:.2e}"
    assert err_u < 0.5, f"u err {err_u:.2e}"
