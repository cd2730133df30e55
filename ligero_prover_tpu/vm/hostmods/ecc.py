"""`ecc` host module — full implementation lands with the SDK layer."""

from ..values import WasmTrap


class EccModule:
    name = "ecc"

    def __init__(self, ctx):
        self.ctx = ctx

    def call(self, func: str):
        handler = getattr(self, func, None)
        if handler is None:
            raise WasmTrap(f"ecc.{func} not implemented yet")
        handler()

    def finalize(self):
        pass
