"""CSTR model: exothermic reaction A -> B -> C, A -> D in a stirred tank
with cooling jacket (mirrors reference examples/CSTR/template_model.py).

States: concentrations C_a, C_b [mol/l], reactor/jacket temperatures
T_R, T_K [degC].  Inputs: feed flow F [1/h], cooling power Q_dot [kW].
Uncertain parameters: reaction-rate multipliers alpha, beta.
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm
from dompc_tpu import sym


def template_model():
    model = dm.model.Model("continuous")

    # certain parameters
    K0_ab = 1.287e12        # K0 [h^-1]
    K0_bc = 1.287e12        # K0 [h^-1]
    K0_ad = 9.043e9         # K0 [l/mol.h]
    R_gas = 8.3144621e-3    # universal gas constant
    E_A_ab = 9758.3 * 1.0   # * R_gas
    E_A_bc = 9758.3 * 1.0   # * R_gas
    E_A_ad = 8560.0 * 1.0   # * R_gas
    H_R_ab = 4.2            # [kj/mol A]
    H_R_bc = -11.0          # [kj/mol B]
    H_R_ad = -41.85         # [kj/mol A]
    Rou = 0.9342            # density [kg/l]
    Cp = 3.01               # specific heat capacity [kj/Kg.K]
    Cp_k = 2.0              # coolant heat capacity [kj/kg.k]
    A_R = 0.215             # area of reactor wall [m^2]
    V_R = 10.01             # 0.01 the volume of the reactor [l]
    m_k = 5.0               # coolant mass [kg]
    T_in = 130.0            # temp of inflow [degC]
    K_w = 4032.0            # [kj/h.m^2.K]
    C_A0 = (5.7 + 4.5) / 2.0 * 1.0  # concentration of A in inlet [mol/l]

    # states
    C_a = model.set_variable("_x", "C_a")
    C_b = model.set_variable("_x", "C_b")
    T_R = model.set_variable("_x", "T_R")
    T_K = model.set_variable("_x", "T_K")

    # inputs
    F = model.set_variable("_u", "F")
    Q_dot = model.set_variable("_u", "Q_dot")

    # uncertain parameters
    alpha = model.set_variable("_p", "alpha")
    beta = model.set_variable("_p", "beta")

    T_dif = model.set_expression("T_dif", T_R - T_K)

    K_1 = beta * K0_ab * sym.exp((-E_A_ab) / (T_R + 273.15))
    K_2 = K0_bc * sym.exp((-E_A_bc) / (T_R + 273.15))
    K_3 = K0_ad * sym.exp((-alpha * E_A_ad) / (T_R + 273.15))

    model.set_rhs("C_a", F * (C_A0 - C_a) - K_1 * C_a - K_3 * (C_a ** 2))
    model.set_rhs("C_b", -F * C_b + K_1 * C_a - K_2 * C_b)
    model.set_rhs("T_R", ((K_1 * C_a * H_R_ab + K_2 * C_b * H_R_bc
                           + K_3 * (C_a ** 2) * H_R_ad) / (-Rou * Cp))
                  + F * (T_in - T_R)
                  + (((K_w * A_R) * (-T_dif)) / (Rou * Cp * V_R)))
    model.set_rhs("T_K", (Q_dot + K_w * A_R * T_dif) / (m_k * Cp_k))

    model.setup()
    return model
