from tggcn.ops.geo_gcn_pallas import geo_gcn_fused, geo_gcn_reference
