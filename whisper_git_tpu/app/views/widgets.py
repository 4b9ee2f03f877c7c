"""Shared overlay widgets: context menus and toast notifications.

Capability parity with the reference's context-menu builders
(ui_app.rs:4546-4788) and toast system (color-coded, stacking ≤3,
bottom-center — README "Toast Notifications").
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

from ...ui import El, column, rect, row, spacer, text
from ...ui.theme import DARK as T

TOAST_LIFETIME = 4.0   # seconds
TOAST_FADE = 1.0
MAX_VISIBLE_TOASTS = 3


@dataclass(frozen=True)
class MenuItem:
    label: str
    route: str
    destructive: bool = False
    separator_before: bool = False


@dataclass
class ContextMenuState:
    """reference: ContextMenuState/ContextTarget, ui_app.rs:213-241."""

    items: list[MenuItem]
    x: float
    y: float
    target: str = ""            # e.g. "commit:abc123"
    selected_index: int = 0


def context_menu(state: ContextMenuState) -> El:
    rows: list[El] = []
    for i, item in enumerate(state.items):
        if item.separator_before:
            rows.append(rect(width="fill", height=1, fill=T.border))
        color = T.danger if item.destructive else T.text
        rows.append(rect(
            text(item.label, font_size=T.font_size, color=color),
            width="fill", height=24, radius=4, padding=(3, 10, 3, 10),
            fill=T.surface_hover if i == state.selected_index else None,
            hover_fill=T.surface_hover, route=item.route,
            key=f"menu-item:{item.route}"))
    menu = rect(column(*rows, gap=1, width=230, padding=(5, 5, 5, 5)),
                fill=T.surface_raised, border=T.border_light, border_width=1,
                radius=8, shadow=True, key="context-menu")
    # Position wrapper: scrim catches outside clicks.
    return rect(
        rect(menu, padding=(state.y, 0, 0, state.x)),
        width="fill", height="fill", route="close-menu", key="menu-scrim")


@dataclass
class Toast:
    kind: str       # success | error | info
    message: str
    created: float = field(default_factory=time.monotonic)

    def age(self) -> float:
        return time.monotonic() - self.created

    def expired(self) -> bool:
        return self.age() > TOAST_LIFETIME + TOAST_FADE

    def opacity(self) -> float:
        a = self.age()
        if a <= TOAST_LIFETIME:
            return 1.0
        return max(0.0, 1.0 - (a - TOAST_LIFETIME) / TOAST_FADE)


def toasts_overlay(toasts: list[Toast]) -> Optional[El]:
    visible = [t for t in toasts if not t.expired()][-MAX_VISIBLE_TOASTS:]
    if not visible:
        return None
    colors = {"success": T.success, "error": T.danger, "info": T.info}
    cards = []
    for t in visible:
        c = colors.get(t.kind, T.info)
        cards.append(rect(
            row(rect(width=8, height=8, radius=4, fill=c),
                text(t.message[:90], color=T.text, font_size=T.font_size),
                gap=8, align="center"),
            fill=T.surface_raised, border=(c[0], c[1], c[2], 0.5),
            border_width=1, radius=8, padding=(7, 12, 7, 12),
            opacity=t.opacity(), shadow=True))
    stackcol = column(*cards, gap=6, align="center")
    return rect(
        column(spacer(), stackcol, spacer(12), align="center",
               width="fill", height="fill"),
        width="fill", height="fill", key="toasts")
