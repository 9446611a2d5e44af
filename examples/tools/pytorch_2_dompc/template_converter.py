"""Convert a trained ``torch.nn.Sequential`` into a dompc_tpu surrogate
model (mirrors reference
examples/tools/pytorch_2_do-mpc/template_converter.py): each Linear
layer's weights become constant matrices in the symbolic expression
graph; activations map to sym ops.  The resulting discrete model
predicts [position, velocity] at t+dt from (states, input)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                "..", "..", ".."))

import torch
import dompc_tpu as dm
from dompc_tpu import sym

_ACTIVATIONS = {
    torch.nn.Tanh: sym.tanh,
    torch.nn.Sigmoid: sym.sigmoid,
    torch.nn.ReLU: lambda h: sym.fmax(h, 0.0),
}


def template_converter(nn_model):
    surrogate_model = dm.model.Model("discrete")

    states = surrogate_model.set_variable("_x", "states", (2, 1))
    inputs = surrogate_model.set_variable("_u", "inputs", (1, 1))

    h = sym.vertcat(states, inputs)
    for layer in nn_model:
        if isinstance(layer, torch.nn.Linear):
            W = layer.weight.cpu().detach().numpy()
            # model rhs functions evaluate variables as FLAT vectors, so
            # the bias must be flat too (a column would broadcast (n,1)
            # against (n,) into (n,n))
            b = layer.bias.cpu().detach().numpy()
            h = W @ h + b
        else:
            for cls, fn in _ACTIVATIONS.items():
                if isinstance(layer, cls):
                    h = fn(h)
                    break
            else:
                raise TypeError(f"unsupported layer {type(layer).__name__}")

    surrogate_model.set_rhs("states", h)
    surrogate_model.setup()
    return surrogate_model
