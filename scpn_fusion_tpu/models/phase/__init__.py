"""Phase dynamics: Kuramoto-Sakaguchi, multi-layer UPDE, Lyapunov guard."""
