"""Obstacles (circle + rotated rect) and the interactive mouse impulse.

The reference drives these from an egui panel and winit mouse events
(SURVEY.md 2.11, 2.13); headless they are plain API calls.

    python examples/obstacles_and_mouse.py
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math

from tpufluid import SimSettings, TickParams
from tpufluid.app import FluidApp
from tpufluid.ops import forcefield as ff

app = FluidApp(
    SimSettings(particle_count=16384, particle_spacing=0.1,
                smoothing_radius=0.2, size=(24.0, 24.0), cell_capacity=32),
    TickParams.default(gravity=(0.0, -9.8)),
    objects=ff.Objects.from_list([
        ("circle", (0.0, -6.0), 3.0),
        ("rect", (6.0, 0.0), (1.0, 8.0), math.pi / 8),
    ]),
)

# attract particles toward a point for 60 ticks (right-button drag)
app.set_mouse(pos=(-6.0, 4.0), state=+1)
for _ in range(60):
    app.tick()
app.set_mouse(state=0)
for _ in range(120):
    app.tick()
print(app.metrics())
app.render_sequence("output/obstacles", frames=3, width=480, height=270,
                    mode="particles")
