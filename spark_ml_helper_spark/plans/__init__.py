"""(stub — filled in as operators are implemented)"""
