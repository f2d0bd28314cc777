"""(stub — filled in below)"""
