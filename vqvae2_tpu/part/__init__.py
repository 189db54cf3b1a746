"""Human-part parsing stack (reference ``part/``): criterion, Lovasz softmax,
SupCon, edge generation, and the parsing head models."""
