"""`uint256` host module — full implementation lands with the SDK layer."""

from ..values import WasmTrap


class Uint256Module:
    name = "uint256"

    def __init__(self, ctx):
        self.ctx = ctx

    def call(self, func: str):
        handler = getattr(self, func, None)
        if handler is None:
            raise WasmTrap(f"uint256.{func} not implemented yet")
        handler()

    def finalize(self):
        pass
