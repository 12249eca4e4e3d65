"""Nuclear engineering: breeding blanket neutronics, plasma-wall erosion."""
