"""Automatic activation quantization — the ``auto_low`` equivalent.

Reference: ``FullPrecision/qtorch/auto_low/auto_low.py:132-212``
(``lower``/``sequential_lower``: walk a torch model and append a ``Quantizer``
module after every layer of selected types). Present-but-unused in the
reference experiments; provided here as a first-class tool.

Flax modules are immutable, so instead of rewriting the tree this uses
``nn.intercept_methods``: a context manager that quantizes the *output* of
every module of the selected types during ``apply``. Works with any model in
the zoo without model changes.
"""

from __future__ import annotations

from typing import Callable, Tuple, Type

import flax.linen as nn
import jax.numpy as jnp


class Quantizer(nn.Module):
    """Module wrapper around a quantization function — the ``qtorch
    Quantizer`` equivalent (reference ``quant_module.py:9-23``)."""

    quant_fn: Callable

    @nn.compact
    def __call__(self, x):
        return self.quant_fn(x)


def quantize_activations(
    quant_fn: Callable,
    layer_types: Tuple[Type[nn.Module], ...] = (nn.Dense,),
):
    """Context manager: during ``model.apply`` inside the context, the output
    of every module instance of ``layer_types`` is passed through ``quant_fn``
    (the ``sequential_lower`` behavior, reference ``auto_low.py:171-212``).

    Example::

        q = quantizer(forward_number=FixedPoint(8, 4))
        with quantize_activations(lambda x: q(x)):
            out = model.apply(variables, x_enc, x_dec)
    """

    def interceptor(next_fn, args, kwargs, context):
        out = next_fn(*args, **kwargs)
        if isinstance(context.module, layer_types) and context.method_name == "__call__":
            if isinstance(out, tuple):
                return (quant_fn(out[0]), *out[1:])
            if isinstance(out, jnp.ndarray):
                return quant_fn(out)
        return out

    return nn.intercept_methods(interceptor)
