"""Industrial batch polymerization reactor (mirrors reference
examples/industrial_poly/template_model.py): exothermic polymerization
with jacket + external heat exchanger (EHE) cooling and the adiabatic
safety temperature carried as a state.  10 states, 3 inputs, 2 uncertain
parameters (reaction enthalpy delH_R and rate constant k_0)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm
from dompc_tpu import sym


def template_model():
    model = dm.model.Model("continuous")

    # certain parameters
    R = 8.314                # gas constant
    T_F = 25 + 273.15        # feed temperature
    E_a = 8500.0             # activation energy
    A_tank = 65.0            # jacket heat-exchange area
    k_U2 = 32.0              # reaction parameter 1
    k_U1 = 4.0               # reaction parameter 2
    w_WF = .333              # mass fraction water in feed
    w_AF = .667              # mass fraction monomer in feed
    m_M_KW = 5000.0          # coolant mass, jacket
    fm_M_KW = 300000.0       # coolant flow, jacket
    m_AWT_KW = 1000.0        # coolant mass, EHE
    fm_AWT_KW = 100000.0     # coolant flow, EHE
    m_AWT = 200.0            # product mass in EHE
    fm_AWT = 20000.0         # product flow through EHE
    m_S = 39000.0            # reactor steel mass
    c_pW, c_pS, c_pF, c_pR = 4.2, .47, 3.0, 5.0   # specific heats
    k_WS, k_AS, k_PS = 17280.0, 3600.0, 360.0     # heat-transfer coeffs
    alfa = 5 * 20e4 * 3.6
    p_1 = 1.0

    m_W = model.set_variable("_x", "m_W")
    m_A = model.set_variable("_x", "m_A")
    m_P = model.set_variable("_x", "m_P")
    T_R = model.set_variable("_x", "T_R")
    T_S = model.set_variable("_x", "T_S")
    Tout_M = model.set_variable("_x", "Tout_M")
    T_EK = model.set_variable("_x", "T_EK")
    Tout_AWT = model.set_variable("_x", "Tout_AWT")
    model.set_variable("_x", "accum_monom")
    model.set_variable("_x", "T_adiab")

    m_dot_f = model.set_variable("_u", "m_dot_f")
    T_in_M = model.set_variable("_u", "T_in_M")
    T_in_EK = model.set_variable("_u", "T_in_EK")

    delH_R = model.set_variable("_p", "delH_R")
    k_0 = model.set_variable("_p", "k_0")

    U_m = m_P / (m_A + m_P)
    m_ges = m_W + m_A + m_P
    k_R1 = k_0 * sym.exp(-E_a / (R * T_R)) * (k_U1 * (1 - U_m) + k_U2 * U_m)
    k_R2 = k_0 * sym.exp(-E_a / (R * T_EK)) * (k_U1 * (1 - U_m) + k_U2 * U_m)
    k_K = (m_W * k_WS + m_A * k_AS + m_P * k_PS) / m_ges

    m_A_R = m_A - m_A * m_AWT / m_ges
    dot_m_W = m_dot_f * w_WF
    dot_m_A = (m_dot_f * w_AF - k_R1 * m_A_R
               - p_1 * k_R2 * (m_A / m_ges) * m_AWT)
    dot_m_P = k_R1 * m_A_R + p_1 * k_R2 * (m_A / m_ges) * m_AWT
    dot_T_R = 1. / (c_pR * m_ges) * (
        m_dot_f * c_pF * (T_F - T_R) - k_K * A_tank * (T_R - T_S)
        - fm_AWT * c_pR * (T_R - T_EK) + delH_R * k_R1 * m_A_R)

    model.set_rhs("m_W", dot_m_W)
    model.set_rhs("m_A", dot_m_A)
    model.set_rhs("m_P", dot_m_P)
    model.set_rhs("T_R", dot_T_R)
    model.set_rhs("T_S", 1. / (c_pS * m_S) * (
        k_K * A_tank * (T_R - T_S) - k_K * A_tank * (T_S - Tout_M)))
    model.set_rhs("Tout_M", 1. / (c_pW * m_M_KW) * (
        fm_M_KW * c_pW * (T_in_M - Tout_M) + k_K * A_tank * (T_S - Tout_M)))
    model.set_rhs("T_EK", 1. / (c_pR * m_AWT) * (
        fm_AWT * c_pR * (T_R - T_EK) - alfa * (T_EK - Tout_AWT)
        + p_1 * k_R2 * (m_A / m_ges) * m_AWT * delH_R))
    model.set_rhs("Tout_AWT", 1. / (c_pW * m_AWT_KW) * (
        fm_AWT_KW * c_pW * (T_in_EK - Tout_AWT) - alfa * (Tout_AWT - T_EK)))
    model.set_rhs("accum_monom", m_dot_f)
    model.set_rhs("T_adiab",
                  delH_R / (m_ges * c_pR) * dot_m_A
                  - (dot_m_A + dot_m_W + dot_m_P)
                  * (m_A * delH_R / (m_ges * m_ges * c_pR)) + dot_T_R)

    model.setup()
    return model
