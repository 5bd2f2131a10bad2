"""Dam break under gravity: run, report metrics, render frames.

    python examples/dam_break.py
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpufluid import SimSettings, TickParams
from tpufluid.app import FluidApp

app = FluidApp(
    SimSettings(particle_count=16384, particle_spacing=0.1,
                smoothing_radius=0.2, size=(24.0, 24.0), cell_capacity=32),
    TickParams.default(gravity=(0.0, -3.0)),
)

for i in range(240):
    app.tick()
print(app.metrics())

paths = app.render_sequence("output/dam_break", frames=5,
                            width=480, height=270)
print("frames:", paths)
